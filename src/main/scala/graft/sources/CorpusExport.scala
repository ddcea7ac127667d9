package graft.sources

import graft.operators.{Joins, Pipelines}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sharded corpus export — the delivery artifact a training run mounts:
  *
  *   out/split=train|val|test/part-*.parquet   (size-targeted shards)
  *   out/_manifest/                            (one row per shard)
  *
  * `format` may be parquet, orc, or json — `format = "json"` with
  * `codec = Some("gzip")` produces the compressed-JSONL shard layout
  * most training data loaders mount directly (`part-*.json.gz`), under
  * the SAME manifest contract: counts, bytes, and checksums derive from
  * the committed files (read back through the written listing), and the
  * size probe measures encoded-bytes-per-row in the actual
  * format × codec so the roll target holds for text shards too.
  *
  * with every shard described by (split, shard_path, rows, bytes,
  * content_md5, content_xor): the manifest is what the trainer's data
  * loader trusts for sampling weights, resume offsets, and integrity
  * checks, so it is derived from the files ACTUALLY WRITTEN (read back
  * through the committed listing), never from the input frame.
  *
  * Composition: [[Pipelines.splitByMd5Prefix]] assigns the
  * content-addressed split label; the shard roll target reuses the
  * encoded-bytes-per-row probe of [[OrcTableSink.writeBatchTargetBytes]]
  * (S7) generalized over formats.
  *
  * Scale shape (the 100 TB posture):
  *  - shard count per split = ceil(split_rows / rows_per_shard) from a
  *    3-row count agg; rows route to shards by pmod(xxhash64(id), k) —
  *    so the shuffle fans out to ONE REDUCER PER SHARD (~400k tasks at
  *    100 TB / 256 MB), never 3 mega-reducers keyed on the split label
  *    alone, and `maxRecordsPerFile` stays as the hard ceiling under
  *    hash skew or (split, shard) reducer collisions.
  *  - manifest checksums are per-shard folds: content_xor is an
  *    order-independent XOR of per-row hash prefixes (constant state),
  *    content_md5 is the md5 of the SORTED per-row hashes — its
  *    collect_list buffer is bounded by one shard's row count
  *    (~32 B/row ⇒ ≈ targetShardBytes × 32/bytesPerRow per task),
  *    independent tasks, never a global fold.
  *  - manifest counts/checksums are provably ≡ the table's: shards
  *    partition the corpus, so per-split SUM(rows) and XOR(content_xor)
  *    over the manifest replay exactly from the input table (the
  *    x_corpus_export oracle pins this).
  *
  * Null contract: content hashing uses concat_ws, which skips nulls —
  * a null and an empty string hash alike; hash NULL-sensitive columns
  * through an explicit coalesce upstream if that distinction matters.
  * The manifest read-back applies the WRITTEN DataFrame's schema (no
  * inference), so JSON shards round-trip type-faithfully: omitted null
  * fields read back as typed nulls (even for all-null columns), and a
  * string column whose values happen to look numeric stays a string —
  * checksums are format-invariant by construction.
  *
  * Returns the manifest DataFrame (also persisted at out/_manifest —
  * underscore-prefixed, so corpus readers of `outDir` never see it).
  */
object CorpusExport {

  def exportShards(df: DataFrame, idCol: String,
                   contentCols: Seq[String],
                   outDir: String,
                   format: String = "parquet",
                   targetShardBytes: Long = 256L * 1024 * 1024,
                   cuts: Seq[(String, Int)] =
                     Seq("train" -> 14, "val" -> 15, "test" -> 16),
                   sampleRows: Int = 10000,
                   codec: Option[String] = None): DataFrame = {
    require(targetShardBytes > 0, "targetShardBytes must be positive")
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    Joins.requireFreeColumns("exportShards", df.columns,
      "split", "__shard", "__h", "__hl")
    val spark = df.sparkSession
    // NOT checkpointed: the probe reads 10k rows, the count agg prunes
    // to the id column, and the write is the one full pass — pinning a
    // 100 TB corpus in executor storage to save re-deriving an md5
    // nibble would be the real scale bug.
    val labeled = Pipelines.splitByMd5Prefix(df, idCol, cuts)
    // probe dir is applicationId-keyed: two concurrent exports sharing
    // an outDir would otherwise clobber each other's probe data and
    // skew or fail the sizing (readers never see it — underscore name)
    val bytesPerRow = estimateBytesPerRow(labeled, sampleRows, format,
      s"$outDir/_probe_${spark.sparkContext.applicationId}", codec)
    val rowsPerShard = math.max(1L, (targetShardBytes / bytesPerRow).toLong)
    val splitCounts = labeled.groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val shardsPerSplit = splitCounts.map { case (s, n) =>
      s -> math.max(1L, (n + rowsPerShard - 1L) / rowsPerShard)
    }
    val kExpr = shardsPerSplit.foldLeft(lit(1L)) { case (els, (s, k)) =>
      when(col("split") === s, lit(k)).otherwise(els)
    }
    val totalShards = math.max(1L, shardsPerSplit.values.sum).toInt
    val writer = labeled
      .withColumn("__shard", pmod(xxhash64(col(idCol)), kExpr))
      .repartition(totalShards, col("split"), col("__shard"))
      .drop("__shard")
      .write.format(format).mode("overwrite").partitionBy("split")
      .option("maxRecordsPerFile", rowsPerShard)
    codec.fold(writer)(c => writer.option("compression", c)).save(outDir)
    // read back under the WRITTEN schema, never inference: a JSON
    // read-back of a numeric-looking string column would otherwise
    // infer bigint and re-stringify differently ('007' → '7'),
    // silently changing content_md5/content_xor vs the typed formats
    val manifest = buildManifest(
      spark.read.format(format).schema(labeled.schema).load(outDir),
      contentCols, outDir)
    manifest.write.mode("overwrite").parquet(s"$outDir/_manifest")
    spark.read.parquet(s"$outDir/_manifest")
  }

  /** Incremental (generation-partitioned) corpus export — the recurring
    * crawl's delivery path: each call lands ONLY the new generation's
    * shards under `split=…/gen=N/` (dynamic partition overwrite, so a
    * replayed generation atomically replaces exactly its own partitions
    * — the bpeSave version contract) and UNIONS the manifest instead of
    * rewriting the world. A monthly 1 PB corpus with a 10 TB delta
    * writes 10 TB, not 1 PB.
    *
    * Manifest contract: same per-shard columns as [[exportShards]] plus
    * (gen, shard_id). Checksums come from the COMMITTED files of the
    * new generation only (read back under the written schema); prior
    * generations' rows carry over untouched — they were derived from
    * their own committed files at their own append time. `shard_id` is
    * globally monotone: prior max + dense row_number over the new
    * generation's (split, shard_path) — ids never reuse, so trainer
    * resume offsets stay valid across appends.
    *
    * Replay rule: NEW generations must land in increasing order, but
    * re-running any EXISTING generation is idempotent (its data
    * partitions and manifest rows are replaced; ids re-derive from the
    * generations below it, which a same-data replay reproduces
    * exactly — the at-least-once contract a fresh-checkpoint stream
    * replay needs). Only inserting a NEW generation below
    * already-landed ones is refused loudly — that would re-number
    * history under a mounted trainer. */
  def exportShardsIncremental(delta: DataFrame, idCol: String,
                              contentCols: Seq[String],
                              outDir: String, generation: Long,
                              format: String = "parquet",
                              targetShardBytes: Long = 256L * 1024 * 1024,
                              cuts: Seq[(String, Int)] =
                                Seq("train" -> 14, "val" -> 15, "test" -> 16),
                              sampleRows: Int = 10000,
                              codec: Option[String] = None): DataFrame = {
    require(generation >= 0, "generation must be >= 0")
    require(targetShardBytes > 0, "targetShardBytes must be positive")
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    Joins.requireFreeColumns("exportShardsIncremental", delta.columns,
      "split", "gen", "__shard", "__h", "__hl")
    val spark = delta.sparkSession
    // the order guard runs BEFORE any data write: a refused generation
    // must leave the corpus dir untouched (a post-write throw would
    // orphan shards no manifest row covers — phantom rows for every
    // reader of outDir)
    val manifestPath = s"$outDir/_manifest"
    // all probes resolve through the Hadoop FileSystem of outDir — a
    // java.io.File probe on an hdfs://|s3a:// dir would silently read
    // empty and drop every prior generation from the manifest
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasPrior =
      listDataFiles(fs, new org.apache.hadoop.fs.Path(manifestPath)).nonEmpty
    // a data dir with NO manifest is one of three states, two refused:
    // (a) a crashed manifest COMMIT — the full union still lives at
    //     _manifest_staging; refuse with the rename-recovery hint
    //     (rebuilding would orphan every prior generation as phantom
    //     rows and restart shard_id under a mounted trainer);
    // (b) data for OTHER generations with neither manifest nor staging
    //     — a foreign dir or a truly lost manifest; refuse loudly;
    // (c) data for exactly THIS generation — a crashed FIRST append
    //     (later appends never remove _manifest while data stands
    //     except inside the staged swap, which leaves staging), whose
    //     replay must proceed: dynamic overwrite replaces its own
    //     partitions wholesale and the manifest rebuilds from scratch.
    checkDataWithoutManifest("exportShardsIncremental", fs, outDir,
      hasPrior, generation)
    // prior rows materialize NOW; the manifest overwrite below reads
    // from the same path; the table is metadata-sized (row per shard)
    val allPrior: Option[DataFrame] =
      if (hasPrior) Some(spark.read.parquet(manifestPath).localCheckpoint())
      else None
    // replaying an EXISTING generation is legal and idempotent (the
    // at-least-once contract: a fresh-checkpoint stream replay re-lands
    // every batch; ids re-derive from the generations BELOW it, which a
    // same-data replay reproduces exactly). Only a NEW generation
    // inserted below already-landed ones is refused — that renumbers
    // history under a mounted trainer.
    val allGens = allPrior.map(_.select(col("gen")).distinct()
      .collect().map(_.getLong(0)).toSet).getOrElse(Set.empty[Long])
    require(allGens.forall(_ < generation) || allGens(generation),
      s"exportShardsIncremental: generation $generation would be a NEW " +
        s"generation below already-landed ones at $outDir — appending " +
        "out of order would re-number history under a mounted trainer")
    val labeled = Pipelines.splitByMd5Prefix(delta, idCol, cuts)
      .withColumn("gen", lit(generation))
    val bytesPerRow = estimateBytesPerRow(labeled, sampleRows, format,
      s"$outDir/_probe_${spark.sparkContext.applicationId}", codec)
    val rowsPerShard = math.max(1L, (targetShardBytes / bytesPerRow).toLong)
    val splitCounts = labeled.groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val shardsPerSplit = splitCounts.map { case (s, n) =>
      s -> math.max(1L, (n + rowsPerShard - 1L) / rowsPerShard)
    }
    val kExpr = shardsPerSplit.foldLeft(lit(1L)) { case (els, (s, k)) =>
      when(col("split") === s, lit(k)).otherwise(els)
    }
    val totalShards = math.max(1L, shardsPerSplit.values.sum).toInt
    val routed = labeled
      .withColumn("__shard", pmod(xxhash64(col(idCol)), kExpr))
      .repartition(totalShards, col("split"), col("__shard"))
      .drop("__shard")
    if (allGens.exists(_ > generation)) {
      // Replaying a generation BELOW already-landed ones: its re-derived
      // shard ids must not collide with, or gap against, later
      // generations' — so its shard COUNT must reproduce the manifest's,
      // and that must be known BEFORE the generation's live partitions
      // are touched (a post-write refusal would leave data ≠ manifest
      // and demand a manual same-data re-run to restore consistency).
      // The file count is not derivable up front (reducer collisions
      // shift maxRecordsPerFile roll boundaries), so the write STAGES
      // under an app-keyed underscore dir, the count checks against the
      // untouched manifest, and only a match swaps the partition dirs
      // in. On refusal the corpus dir is untouched; a crash mid-swap
      // self-heals on the same-append replay (the manifest still holds,
      // so the count re-passes and the swap re-runs over every split).
      val staging =
        s"$outDir/_gen_staging_${spark.sparkContext.applicationId}"
      val stagingP = new org.apache.hadoop.fs.Path(staging)
      try {
        val w = routed.write.format(format).mode("overwrite")
          .partitionBy("split", "gen")
          .option("maxRecordsPerFile", rowsPerShard)
        codec.fold(w)(c => w.option("compression", c)).save(staging)
        val newN = listDataFiles(fs, stagingP).size.toLong
        val oldN = allPrior.get.where(col("gen") === generation).count()
        require(newN == oldN,
          s"exportShardsIncremental: replaying NON-latest generation " +
            s"$generation produced $newN shards where the manifest holds " +
            s"$oldN — the re-derived shard ids would collide with or gap " +
            "against later generations'; only a same-data (same shard " +
            "count) replay of a non-latest generation is legal. The " +
            "corpus dir is UNTOUCHED (the mismatch was caught at the " +
            "staging step, before any live partition was replaced)")
        Option(fs.globStatus(new org.apache.hadoop.fs.Path(
            s"$outDir/split=*/gen=$generation")))
          .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
          .foreach(st => fs.delete(st.getPath, true))
        Option(fs.globStatus(new org.apache.hadoop.fs.Path(
            s"$staging/split=*/gen=$generation")))
          .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
          .foreach { st =>
            val dest = new org.apache.hadoop.fs.Path(new org.apache.hadoop
              .fs.Path(outDir, st.getPath.getParent.getName),
              st.getPath.getName)
            fs.mkdirs(dest.getParent)
            require(fs.rename(st.getPath, dest),
              s"exportShardsIncremental: swap rename ${st.getPath} -> " +
                s"$dest failed")
          }
      } finally { fs.delete(stagingP, true); () }
    } else {
      val writer = routed
        .write.format(format).mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("split", "gen")
        .option("maxRecordsPerFile", rowsPerShard)
      codec.fold(writer)(c => writer.option("compression", c)).save(outDir)
    }
    // manifest rows for THIS generation only, from its committed files
    val genManifest = buildManifest(
      spark.read.format(format).schema(labeled.schema).load(outDir)
        .where(col("gen") === generation),
      contentCols, outDir, partDepth = 2)
      .withColumn("gen", lit(generation))
    val prior = allPrior
      .getOrElse(genManifest.withColumn("shard_id", lit(0L)).limit(0))
      .where(col("gen") =!= generation)
    val maxId = prior.where(col("gen") < generation)
      .agg(coalesce(max("shard_id"), lit(-1L)))
      .head().getLong(0)
    // unpartitioned window is safe here by the k-rows-only exception:
    // the frame is ONE generation's manifest (a row per shard)
    val fresh = genManifest.withColumn("shard_id",
      lit(maxId) + row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("split"), col("shard_path"))).cast("long"))
    // (the NON-latest-replay shard-count guard ran pre-swap above, on
    // the staged files, so a refusal leaves data ≡ manifest)
    // atomic-ish manifest commit: the union lands complete at a staging
    // path first, then swaps in via delete + rename — an in-place
    // overwrite would truncate _manifest before rewriting it, and a
    // crash in that window silently erases every prior generation's
    // rows (the next append would see hasPrior=false). A crash between
    // the delete and the rename leaves _manifest absent WITH data
    // present, which the entry guard above refuses loudly and the
    // staging dir recovers.
    val stagingPath = new org.apache.hadoop.fs.Path(s"$outDir/_manifest_staging")
    val manifestP = new org.apache.hadoop.fs.Path(manifestPath)
    prior.unionByName(fresh.select(prior.columns.map(col): _*))
      .write.mode("overwrite").parquet(stagingPath.toString)
    if (fs.exists(manifestP)) fs.delete(manifestP, true)
    require(fs.rename(stagingPath, manifestP),
      s"exportShardsIncremental: rename $stagingPath -> $manifestP failed")
    spark.read.parquet(manifestPath)
  }

  /** One manifest row per written shard file. Separate so audits can
    * re-derive a manifest for an existing export and diff it.
    * `partDepth` is the number of partition directory levels under
    * `outDir` (1 for split=…, 2 for split=…/gen=…). */
  private[graft] def buildManifest(written: DataFrame,
                                   contentCols: Seq[String],
                                   outDir: String,
                                   partDepth: Int = 1): DataFrame = {
    val rowHash = md5(concat_ws("\u0001",
      contentCols.map(c => col(c).cast("string")): _*))
    val perShard = written
      .select(col("split"), input_file_name().as("shard_path"),
        rowHash.as("__h"))
      .withColumn("__hl",
        conv(substring(col("__h"), 1, 15), 16, 10).cast("long"))
      .groupBy("split", "shard_path")
      .agg(count(lit(1)).as("rows"),
        md5(concat_ws("", sort_array(collect_list(col("__h")))))
          .as("content_md5"),
        expr("bit_xor(__hl)").as("content_xor"))
    // file sizes: one driver-side listing (≤ one entry per shard — the
    // standard metadata-scale op), broadcast-joined onto the agg. The
    // join key is the outDir-RELATIVE path (split=…/part-…): part-file
    // names repeat across partition dirs (one task number serves every
    // split it touches), and absolute URIs don't compare byte-for-byte
    // between input_file_name() and the listing (scheme slashing).
    // Listing goes through the Hadoop FileSystem of outDir so it
    // resolves file://, hdfs://, and s3a:// alike.
    val spark = written.sparkSession
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fileBytes = listDataFiles(fs, new org.apache.hadoop.fs.Path(outDir))
    import spark.implicits._
    val relOf = regexp_extract(col("shard_path"),
      s"(?:[^/]+/){$partDepth}[^/]+$$", 0)
    perShard
      .withColumn("__rel", relOf)
      .join(broadcast(fileBytes.toDF("__rel", "bytes")), Seq("__rel"),
        "left")
      .select(col("split"), col("shard_path"), col("rows"), col("bytes"),
        col("content_md5"), col("content_xor"))
  }

  /** The data-without-manifest triage shared by the parquet/JSONL and
    * WebDataset incremental exports (the three-state contract in
    * [[exportShardsIncremental]]'s comment): refuse a crashed manifest
    * commit with the `_manifest_staging` recovery hint, refuse foreign
    * or manifest-lost generation data, and let exactly the replay of a
    * crashed FIRST append (all existing gen dirs == this generation)
    * proceed to self-heal. */
  private[graft] def checkDataWithoutManifest(
      op: String, fs: org.apache.hadoop.fs.FileSystem, outDir: String,
      hasPrior: Boolean, generation: Long): Unit = {
    val hasData = Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$outDir/split=*")))
      .exists(_.nonEmpty)
    if (!hasPrior && hasData) {
      require(!fs.exists(
          new org.apache.hadoop.fs.Path(s"$outDir/_manifest_staging")),
        s"$op: $outDir holds split=* data partitions but no _manifest — " +
          "a crashed manifest commit leaves the full union at " +
          "_manifest_staging (rename it back to _manifest); refusing to " +
          "rebuild a manifest that would orphan prior generations")
      val strays = Option(fs.globStatus(
          new org.apache.hadoop.fs.Path(s"$outDir/split=*/gen=*")))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .map(_.getPath.getName).distinct
        .filter(_ != s"gen=$generation")
      require(strays.isEmpty,
        s"$op: $outDir holds data for generation(s) " +
          s"${strays.sorted.mkString(", ")} with neither _manifest nor " +
          s"_manifest_staging — not a replay of a crashed first append " +
          s"of generation $generation; refusing to rebuild a manifest " +
          "that would orphan that data")
    }
  }

  /** Recursive data-file listing (underscore/dot names pruned) through
    * the Hadoop FileSystem API — works for file://, hdfs://, s3a://
    * and bare local paths alike, and returns the empty listing (never
    * null, never a throw) when `dir` does not exist. Yields
    * (dir-relative path with '/' separators, bytes) per file. */
  private[graft] def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                                   dir: org.apache.hadoop.fs.Path,
                                   prefix: String = ""): Seq[(String, Long)] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      .flatMap { st =>
        if (st.isFile) Seq((prefix + st.getPath.getName, st.getLen))
        else listDataFiles(fs, st.getPath, prefix + st.getPath.getName + "/")
      }

  /** Encoded bytes per row in `format`, measured from a bounded probe
    * write — the [[OrcTableSink.estimateOrcBytesPerRow]] pattern
    * generalized over formats. The probe lands at `probeDir` (an
    * underscore-named subdir of the destination, so it shares the
    * destination's FILESYSTEM — a driver-local temp dir would read back
    * empty on a real cluster, where executors write their local disks,
    * and silently collapse the sizing to one shard per split) and is
    * deleted after measuring. */
  private[graft] def estimateBytesPerRow(df: DataFrame, sampleRows: Int,
                                         format: String, probeDir: String,
                                         codec: Option[String] = None)
      : Double = {
    require(sampleRows > 0, "sampleRows must be positive")
    val spark = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(probeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val probe = df.limit(sampleRows).coalesce(1)
        .write.mode("overwrite").format(format)
      codec.fold(probe)(c => probe.option("compression", c)).save(probeDir)
      val bytes = fs.listStatus(p)
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .map(_.getLen).sum
      val rows = spark.read.format(format).load(probeDir).count()
      bytes.toDouble / math.max(rows, 1L)
    } finally {
      fs.delete(p, true); ()
    }
  }
}
