package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.synth.Synth

/** Snapshot-table maintenance — the two operations every Iceberg-style table
  * needs between writes: MERGE-shaped upserts (revised forecasts replacing
  * stale rows, new features appended) and small-file compaction planning
  * (bin-packing undersized partitions into rewrite tasks).
  */
object Maintenance {

  /** MERGE INTO analog: rows of `updates` replace same-key rows of `target`;
    * unmatched update rows are inserts; everything else passes through. One
    * anti-join + union — when `updates` is a small batch (the common case)
    * Spark broadcasts it and the target never shuffles. `src` records
    * provenance ('base' kept / 'upd' written this batch). */
  def mergeUpsert(target: DataFrame, updates: DataFrame, key: String): DataFrame =
    target
      .join(updates.select(col(key)), Seq(key), "left_anti")
      .withColumn("src", lit("base"))
      .unionByName(updates.withColumn("src", lit("upd")))

  /** Deterministic revision batch for q76: every 13th feature's forecast is
    * revised +20 %, and 100 brand-new feature ids arrive. */
  def forecastRevisions(spark: SparkSession): DataFrame = {
    val revised = Synth.forecast(spark)
      .filter(col("feature_id") % 13 === 0)
      .select(col("feature_id"), (col("discharge") * lit(1.2)).as("discharge"))
    val inserts = spark.range(0, 100)
      .select((col("id") + 2000000L).as("feature_id"),
        (((col("id") * 91 + 3) % 5000) / lit(10.0)).as("discharge"))
    revised.unionByName(inserts)
  }

  /** Compaction planning (q77) — the `rewriteDataFiles` bin-packer: walk the
    * partitions in key order, accumulate row counts, and cut a rewrite task
    * every `targetRows`. Input is MANIFEST-scale (one row per partition), so
    * the single-task global window is deliberate and cheap — at 100 TB this
    * table has one row per committed partition, not per data row; the heavy
    * rewrite itself stays fully distributed (one task group per output bin). */
  def compactionPlan(sizes: DataFrame, partCol: String, nRowsCol: String,
      targetRows: Long): DataFrame = {
    val w = Window.orderBy(col(partCol)).rowsBetween(Window.unboundedPreceding, -1)
    sizes
      .withColumn("cum_before", coalesce(sum(col(nRowsCol)).over(w), lit(0L)))
      .withColumn("task",
        floor(col("cum_before").cast("double") / lit(targetRows.toDouble)).cast("long"))
  }

  /** Compaction EXECUTION (the rewriteDataFiles job the planner feeds):
    * every committed partition holding more than one parquet file is read
    * back and rewritten as a single file, with a crash-safe swap driven by
    * a per-generation INTENT file (the rewrite's write-ahead log):
    *
    *   1. recover any interrupted swap (see below), then list sources;
    *   2. write the compacted data OUTSIDE the live namespace
    *      (`…parquet.tmp` — readers match only `*.parquet`);
    *   3. write `compact-intent-<gen>.json` naming the target and the exact
    *      source files it replaces;
    *   4. same-directory rename `.tmp` → `.parquet` (atomic);
    *   5. delete the listed sources, then the intent.
    *
    * Crash windows: before 3 → orphan `.tmp`, removed by recovery; between
    * 3 and 4 → intent without target, recovery deletes intent + tmp
    * (original files untouched); between 4 and 5 → recovery finishes the
    * delete of EXACTLY the intent's listed sources — a duplicate is visible
    * only transiently and can never be re-compacted into the data (the next
    * run recovers before it reads), and files appended AFTER the intent are
    * never deleted because the intent lists names, not patterns. Content is
    * byte-identical row-wise, so the manifest's order-insensitive lineage
    * fingerprint STAYS VALID — compaction needs no recommit. Returns the
    * partitions rewritten. */
  def compactTable(spark: SparkSession, table: String, partCol: String): Seq[String] = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    def listFiles(dir: Path, suffix: String): Seq[Path] = {
      val s = Files.list(dir)
      try s.iterator().asScala.filter(_.toString.endsWith(suffix)).toSeq
      finally s.close()
    }
    def recover(dir: Path): Unit = {
      listFiles(dir, ".json").filter(_.getFileName.toString.startsWith("compact-intent-"))
        .foreach { intent =>
          val lines = Files.readAllLines(intent).asScala
          // A TORN intent (crash mid-write before the fsync below made it
          // durable: zero bytes, a malformed target name, or no source list)
          // is treated as if it were never written — the rename that consumes
          // it only happens after the intent and its directory are fsynced,
          // so a torn intent implies the swap did NOT start; sources stay
          // authoritative and the staging tmp is swept by the orphan pass.
          val wellFormed = lines.size >= 2 &&
            lines.head.matches("compacted-\\d+\\.parquet")
          if (wellFormed && Files.exists(dir.resolve(lines.head)))
            // swap completed: finish the source delete
            lines.tail.foreach(n => Files.deleteIfExists(dir.resolve(n)))
          Files.delete(intent) // incomplete swap: sources stay authoritative
        }
      listFiles(dir, ".parquet.tmp").foreach(Files.delete) // orphan staging
    }
    // durable write: the intent (and the directory entry naming it) must hit
    // disk BEFORE the atomic rename — otherwise a power loss could persist
    // the rename but lose intent bytes, and recovery would finish the swap
    // with a truncated source list, letting the next compaction re-compact
    // the surviving duplicates into the data
    def writeDurably(path: Path, bytes: Array[Byte]): Unit = {
      import java.nio.channels.FileChannel
      import java.nio.file.StandardOpenOption._
      val ch = FileChannel.open(path, CREATE, WRITE, TRUNCATE_EXISTING)
      try { ch.write(java.nio.ByteBuffer.wrap(bytes)); ch.force(true) }
      finally ch.close()
      val dch = FileChannel.open(path.getParent, java.nio.file.StandardOpenOption.READ)
      try dch.force(true)
      catch { case _: java.io.IOException => () } // some FS refuse dir fsync
      finally dch.close()
    }
    Snapshots.committedPartitions(table).toSeq.sorted.flatMap { p =>
      val dir = Paths.get(table, s"$partCol=$p")
      if (!Files.isDirectory(dir)) None
      else {
        recover(dir)
        val files = listFiles(dir, ".parquet")
        if (files.size <= 1) None
        else {
          val tmp = Files.createTempDirectory("graft_compact")
          spark.read.parquet(dir.toString)
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val gen = System.nanoTime()
          // coalesce(1) wrote exactly one data file
          val tmpData = listFiles(tmp, ".parquet").head
          val name = s"compacted-$gen.parquet"
          // cross-filesystem copy lands outside the live namespace
          Files.move(tmpData, dir.resolve(name + ".tmp"), StandardCopyOption.REPLACE_EXISTING)
          val intent = dir.resolve(s"compact-intent-$gen.json")
          writeDurably(intent,
            (name +: files.map(_.getFileName.toString)).mkString("\n").getBytes("UTF-8"))
          Files.move(dir.resolve(name + ".tmp"), dir.resolve(name),
            StandardCopyOption.ATOMIC_MOVE)
          files.foreach(Files.delete)
          Files.delete(intent)
          Some(p)
        }
      }
    }
  }

  /** q77's concrete instance: per-HUC8 partition sizes of the points table,
    * packed into ~4096-row rewrite tasks. */
  def hucCompactionPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val sizes = graft.ops.SpatialJoin.assign(spark, Synth.points(spark, sfDir))
      .groupBy(col("huc8")).agg(count(lit(1)).as("n_rows"))
    compactionPlan(sizes, "huc8", "n_rows", 4096L)
      .select(col("huc8"), col("n_rows"), col("cum_before"), col("task"))
  }
}
