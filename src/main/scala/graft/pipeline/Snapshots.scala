package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Iceberg-style snapshot/lineage layer (north rule): partitioned parquet
  * tables with a manifest of committed partitions, idempotent per-partition
  * overwrite, and a lineage table (partition → row count, content hash,
  * commit timestamp). Runs resume by skipping already-committed partitions —
  * the Spark-native analog of the reference's per-HUC rerun +
  * fim_post_processing attempt counter (`fim_pipeline.sh:55-70`).
  *
  * No Iceberg jars ship in this environment, so the snapshot log is a plain
  * JSON-lines manifest under `_graft_manifest/`; the write protocol is the
  * same shape (append-only log, last-writer-wins per partition, atomic
  * rename).
  */
object Snapshots {

  final case class PartitionLineage(part: String, rows: Long, xor: Long, commitTs: Long,
      lo: Double = Double.NaN, hi: Double = Double.NaN)

  private def manifestDir(table: String) = Paths.get(table, "_graft_manifest")
  private def manifestFile(table: String) = manifestDir(table).resolve("lineage.jsonl")

  /** The order-insensitive per-row content hash every fingerprint in this
    * layer is built from: xxhash64 over the row with columns NAME-SORTED, so
    * the value is stable across column reorder on read-back. Each column is
    * string-cast with NULL mapped to a NUL sentinel BEFORE hashing:
    * xxhash64 SKIPS null children (the running seed passes through
    * unchanged), so without the sentinel struct(7, NULL) and struct(NULL, 7)
    * collide and a value migrating between two nullable columns — exactly
    * the out-of-band corruption [[diffTables]] exists to catch — would
    * fingerprint as identical. Shared by the manifest's recorded xor
    * ([[writeResumable]]) and [[diffTables]] — one definition, so the two
    * can never drift apart (specs that independently recompute fingerprints
    * call this too — package-visible for exactly that reason). */
  private[pipeline] def rowHash(df: DataFrame): org.apache.spark.sql.Column =
    xxhash64(df.columns.sorted
      .map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)

  /** Depth-first recursive delete (children before parents — `Files.walk`
    * yields preorder, hence the reverse). The walk stream is closed
    * explicitly: it holds open directory handles until close() or GC, and
    * this helper runs on every q116/parity execution. */
  def deleteRecursively(path: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(path)) {
      val walk = Files.walk(path)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
  }

  def committedPartitions(table: String): Set[String] =
    if (!Files.exists(manifestFile(table))) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(manifestFile(table)).asScala
        .flatMap(l => """"part":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1))).toSet
    }

  /** Write `df` partitioned by `partCol` (string column), committing only the
    * partitions NOT already in the manifest. Each partition directory is
    * written via dynamic partition overwrite (idempotent on retry); the
    * manifest line is appended only after the files land. Returns the
    * lineage rows committed this run.
    *
    * Lineage stats are derived from the FILES JUST WRITTEN, not from a second
    * pass over the source plan: one expensive scan+transform per commit (the
    * write), then a cheap columnar read-back of only the new partition
    * directories for count + fingerprint. This also means the manifest always
    * describes exactly what landed on disk — a nondeterministic source can
    * never record stats inconsistent with the committed files. */
  def writeResumable(spark: SparkSession, df: DataFrame, table: String,
      partCol: String, statsCol: Option[String] = None): Seq[PartitionLineage] = {
    Files.createDirectories(manifestDir(table))
    val done = committedPartitions(table)
    val pending = df.filter(!col(partCol).isin(done.toSeq: _*))
    val owmKey = "spark.sql.sources.partitionOverwriteMode"
    val owmOld = spark.conf.getOption(owmKey)
    spark.conf.set(owmKey, "dynamic")
    try pending.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(table)
    finally owmOld.fold(spark.conf.unset(owmKey))(v => spark.conf.set(owmKey, v))
    // read-back of the written table, pruned to the new partitions; column
    // order is normalized (sorted) so the fingerprint is stable regardless of
    // the partition column's position after read-back
    val snap = readTable(spark, table).filter(!col(partCol).isin(done.toSeq: _*))
    val statsAggs = Seq(count(lit(1)).as("rows"),
      // order-insensitive content fingerprint; bit_xor can't overflow
      bit_xor(rowHash(snap)).as("xor")) ++
      statsCol.toSeq.flatMap(c => Seq(
        min(col(c)).cast("double").as("lo"), max(col(c)).cast("double").as("hi")))
    val stats = snap
      .groupBy(col(partCol).as("part"))
      .agg(statsAggs.head, statsAggs.tail: _*)
      .collect()
      .map(r => PartitionLineage(r.getString(0), r.getLong(1), r.getLong(2),
        System.currentTimeMillis(),
        if (statsCol.isDefined) r.getDouble(3) else Double.NaN,
        if (statsCol.isDefined) r.getDouble(4) else Double.NaN))
    if (stats.nonEmpty) {
      val lines = stats.map { s =>
        val range = if (statsCol.isDefined) s""","lo":${s.lo},"hi":${s.hi}""" else ""
        s"""{"part":"${s.part}","rows":${s.rows},"xor":${s.xor},"commit_ts":${s.commitTs}$range}"""
      }
      Files.write(manifestFile(table),
        (lines.mkString("", "\n", "\n")).getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    }
    stats.toSeq
  }

  /** Stats-based partition skipping (the Iceberg column-statistics payoff):
    * read only partitions whose manifest [lo, hi] range for the stats column
    * overlaps [qLo, qHi] — manifest-level pruning BEFORE any file is opened,
    * on top of parquet's own row-group stats. Partitions without recorded
    * stats are conservatively kept. */
  def readTableSkipping(spark: SparkSession, table: String, partCol: String,
      qLo: Double, qHi: Double): DataFrame = {
    import scala.jdk.CollectionConverters._
    val keep = scala.collection.mutable.LinkedHashSet.empty[String]
    if (Files.exists(manifestFile(table)))
      Files.readAllLines(manifestFile(table)).asScala.foreach { l =>
        """"part":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1)).foreach { p =>
          // full float literal: Double.toString emits scientific notation with
          // negative exponents for |x| < 1e-3 (e.g. 1.0E-4) and may emit
          // NaN/Infinity — a NaN stat cannot prune, so it maps to None
          val num = """(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|NaN|-?Infinity)"""
          def stat(k: String): Option[Double] =
            (s""""$k":$num""").r.findFirstMatchIn(l)
              .map(_.group(1).toDouble).filterNot(_.isNaN)
          val lo = stat("lo")
          val hi = stat("hi")
          val overlaps = (lo, hi) match {
            case (Some(a), Some(b)) => b >= qLo && a <= qHi
            case _ => true // no stats recorded — cannot prune
          }
          if (overlaps) keep += p else keep -= p // last commit wins
        }
      }
    readTable(spark, table).filter(col(partCol).isin(keep.toSeq: _*))
  }

  /** Read a snapshot table back with partition values kept as strings
    * (zero-padded HUC8 ids must not be inferred back to ints). */
  def readTable(spark: SparkSession, table: String): DataFrame = {
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try spark.read.parquet(table)
    finally old.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }

  /** Schema-evolution read (the Iceberg add-column story): partitions written
    * before a column existed surface it as NULL. `mergeSchema` unions the
    * per-file parquet schemas at planning time; column pruning and filter
    * pushdown still reach each file (a file without the column contributes
    * nulls, never a scan error). Pair with [[writeResumable]]: later commits
    * may carry a superset schema and old partitions stay readable unchanged —
    * no rewrite of committed data. */
  def readTableEvolved(spark: SparkSession, table: String): DataFrame = {
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try spark.read.option("mergeSchema", "true").parquet(table)
    finally old.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }

  /** Snapshot (time-travel) read: the table as of `asOfTs` — only partitions
    * whose manifest commit timestamp is ≤ `asOfTs` are visible, the
    * Iceberg-snapshot-read analog over the append-only manifest log. A
    * partition recommitted after `asOfTs` is EXCLUDED (last-writer-wins per
    * partition: its current files no longer represent the old snapshot). */
  def readTableAsOf(spark: SparkSession, table: String, partCol: String,
      asOfTs: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    val latest = scala.collection.mutable.Map.empty[String, Long]
    if (Files.exists(manifestFile(table)))
      Files.readAllLines(manifestFile(table)).asScala.foreach { l =>
        for {
          p <- """"part":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1))
          t <- """"commit_ts":(-?\d+)""".r.findFirstMatchIn(l).map(_.group(1).toLong)
        } latest(p) = t
      }
    val visible = latest.collect { case (p, t) if t <= asOfTs => p }.toSeq
    readTable(spark, table).filter(col(partCol).isin(visible: _*))
  }

  /** Two-snapshot diff — the engine's `tools/hash_compare.py:1-60` analog
    * (the reference's file-by-file hash diff of two run directories, its own
    * bit-compatibility harness after a rebuild). Compares two table paths by
    * per-partition content fingerprint — RECOMPUTED from the files on disk
    * with the same order-insensitive `bit_xor` of row hashes the lineage
    * manifest records (plus a multiplicity-sensitive exact sum of the same
    * hashes), NOT trusted from the manifests, so it
    * also catches out-of-band edits and manifest drift. One distributed
    * scan per table, a coarse full-outer merge on the partition key (the
    * per-partition fingerprint rows are manifest-scale — thousands, not
    * billions — so the merge is trivial at any data size).
    *
    * Returns one row per partition present in either table:
    * `(part, status ∈ identical|changed|added|removed, rows_a, rows_b,
    * xor_a, xor_b)` — `added` = only in B, `removed` = only in A. A schema
    * difference surfaces as `changed` on every shared partition (the
    * fingerprint covers all columns), same as the reference's file hashes. */
  def diffTables(spark: SparkSession, tableA: String, tableB: String,
      partCol: String): DataFrame = {
    def fp(table: String, suffix: String): DataFrame = {
      val t = readTable(spark, table)
      t.groupBy(col(partCol).as("part"))
        .agg(count(lit(1)).as(s"rows_$suffix"),
          bit_xor(rowHash(t)).as(s"xor_$suffix"),
          // xor alone misses balanced odd-multiplicity changes (one row's
          // count 1→3 while another's goes 3→1 leaves x⊕x⊕x = x and total
          // rows unchanged); the exact 128-bit-wide sum of the same row
          // hashes is multiplicity-sensitive and closes that hole
          sum(rowHash(t).cast("decimal(38,0)")).as(s"sum_$suffix"))
    }
    fp(tableA, "a").join(fp(tableB, "b"), Seq("part"), "full_outer")
      .select(col("part"),
        when(col("rows_a").isNull, lit("added"))
          .when(col("rows_b").isNull, lit("removed"))
          .when(col("rows_a") === col("rows_b") && col("xor_a") === col("xor_b")
            && col("sum_a") === col("sum_b"), lit("identical"))
          .otherwise(lit("changed")).as("status"),
        col("rows_a"), col("rows_b"), col("xor_a"), col("xor_b"))
  }

  /** The lineage/metrics table as a DataFrame. */
  def lineage(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val rows =
      if (!Files.exists(manifestFile(table))) Seq.empty[PartitionLineage]
      else Files.readAllLines(manifestFile(table)).asScala.toSeq.flatMap { l =>
        for {
          p <- """"part":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1))
          r <- """"rows":(-?\d+)""".r.findFirstMatchIn(l).map(_.group(1).toLong)
          x <- """"xor":(-?\d+)""".r.findFirstMatchIn(l).map(_.group(1).toLong)
          t <- """"commit_ts":(-?\d+)""".r.findFirstMatchIn(l).map(_.group(1).toLong)
        } yield PartitionLineage(p, r, x, t)
      }
    rows.toDF()
  }
}
