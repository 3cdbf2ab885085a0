package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.synth.Synth
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class SnapshotsSpec extends SparkTestBase {

  test("diffTables (hash_compare analog): rebuild == identical; perturb -> names the partition") {
    val dir = Files.createTempDirectory("graft_diff").toString
    val df = graft.ops.SpatialJoin.assign(spark, Synth.points(spark, sf0001))
      .select(col("pid"), col("hydroid"), col("huc8"), col("hand"))
    Snapshots.writeResumable(spark, df, s"$dir/a", "huc8")
    Snapshots.writeResumable(spark, df, s"$dir/b", "huc8")

    // independent rebuild of the same data: every partition identical
    val same = Snapshots.diffTables(spark, s"$dir/a", s"$dir/b", "huc8")
    assert(same.filter(col("status") =!= "identical").count() == 0)
    val nParts = same.count()
    assert(nParts > 1)

    // perturb ONE row of ONE partition in b (out-of-band edit — no manifest
    // update, which is exactly what the recomputed fingerprint must catch)
    val victim = Snapshots.readTable(spark, s"$dir/b")
      .select("huc8").distinct().orderBy("huc8").limit(1)
      .collect()(0).getString(0)
    val part = Snapshots.readTable(spark, s"$dir/b").filter(col("huc8") === victim)
    val perturbed = part.withColumn("hand",
      when(col("pid") === part.agg(min("pid")).collect()(0).getLong(0),
        col("hand") + 1.0).otherwise(col("hand")))
    perturbed.write.mode("overwrite").parquet(s"$dir/victim_tmp")
    val vDir = Paths.get(dir, "b", s"huc8=$victim")
    Snapshots.deleteRecursively(vDir)
    Files.createDirectories(vDir)
    spark.read.parquet(s"$dir/victim_tmp").drop("huc8")
      .write.mode("overwrite").parquet(vDir.toString)

    val diff = Snapshots.diffTables(spark, s"$dir/a", s"$dir/b", "huc8")
    val changed = diff.filter(col("status") === "changed")
      .select("part").collect().map(_.getString(0)).toSeq
    assert(changed == Seq(victim), s"diff should name exactly the perturbed partition: $changed")
    assert(diff.filter(col("status") === "identical").count() == nParts - 1)

    // remove a partition from a -> reported added (present only in b)
    val aDir = Paths.get(dir, "a", s"huc8=$victim")
    Snapshots.deleteRecursively(aDir)
    val diff2 = Snapshots.diffTables(spark, s"$dir/a", s"$dir/b", "huc8")
    assert(diff2.filter(col("status") === "added")
      .select("part").collect().map(_.getString(0)).toSeq == Seq(victim))
  }

  test("diffTables catches balanced odd-multiplicity swaps (xor-blind case)") {
    import spark.implicits._
    // rows x,y with multiplicities (1,3) vs (3,1): x⊕x⊕x = x so the xor and
    // the row count both match — only the multiplicity-sensitive hash sum
    // can tell the tables apart
    val dir = Files.createTempDirectory("graft_diffm").toString
    Seq(("p", 1L), ("p", 2L), ("p", 2L), ("p", 2L)).toDF("part", "v")
      .write.partitionBy("part").parquet(s"$dir/a")
    Seq(("p", 1L), ("p", 1L), ("p", 1L), ("p", 2L)).toDF("part", "v")
      .write.partitionBy("part").parquet(s"$dir/b")
    val d = Snapshots.diffTables(spark, s"$dir/a", s"$dir/b", "part").collect()
    assert(d.length == 1 && d(0).getString(1) == "changed")
  }

  test("diffTables catches a value migrating between nullable columns (xxhash64 null-skip case)") {
    import spark.implicits._
    // xxhash64 skips NULL children (seed passes through), so without the
    // NUL-sentinel string cast, (7, NULL) and (NULL, 7) hash identically and
    // a corrupted rewrite that swaps which column holds the value would
    // fingerprint as identical
    val dir = Files.createTempDirectory("graft_diffn").toString
    Seq(("p", Some(7L), Option.empty[Long])).toDF("part", "u", "v")
      .write.partitionBy("part").parquet(s"$dir/a")
    Seq(("p", Option.empty[Long], Some(7L))).toDF("part", "u", "v")
      .write.partitionBy("part").parquet(s"$dir/b")
    val d = Snapshots.diffTables(spark, s"$dir/a", s"$dir/b", "part").collect()
    assert(d.length == 1 && d(0).getString(1) == "changed")
  }

  test("resumable write: kill/rerun at partition granularity recomputes only missing partitions") {
    val dir = Files.createTempDirectory("graft_snap").toString
    val table = s"$dir/tiles"
    val df = graft.ops.SpatialJoin.assign(spark, Synth.points(spark, sf0001))
      .select(col("pid"), col("hydroid"), col("huc8"), col("hand"))

    // first run commits everything
    val first = Snapshots.writeResumable(spark, df, table, "huc8")
    assert(first.nonEmpty)
    val total = Snapshots.readTable(spark, table).count()
    assert(total == df.count())

    // simulate a partial failure: remove one partition's manifest lines + files
    val victim = first.head.part
    val manifest = Paths.get(table, "_graft_manifest", "lineage.jsonl")
    val keep = Files.readAllLines(manifest).asScala.filterNot(_.contains(s""""part":"$victim""""))
    Files.write(manifest, keep.mkString("", "\n", "\n").getBytes)
    val partDir = Paths.get(table, s"huc8=$victim")
    Snapshots.deleteRecursively(partDir)

    assert(Snapshots.readTable(spark, table).count() < total)

    // resume: only the victim partition is recomputed
    val second = Snapshots.writeResumable(spark, df, table, "huc8")
    assert(second.map(_.part) == Seq(victim))
    assert(Snapshots.readTable(spark, table).count() == total)

    // third run: nothing pending
    assert(Snapshots.writeResumable(spark, df, table, "huc8").isEmpty)

    // lineage table matches the data: per-partition rows and fingerprint
    val lin = Snapshots.lineage(spark, table)
    assert(lin.count() == first.size)
    val rowsByPart = Snapshots.readTable(spark, table).groupBy("huc8").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    lin.collect().foreach { r =>
      assert(rowsByPart(r.getString(0)) == r.getLong(1))
    }

    // snapshot (time-travel) read: as of the FIRST run's commits, the
    // recommitted victim partition is invisible (its current files postdate
    // the snapshot), everything else is
    val firstTs = first.map(_.commitTs).max
    val asOf = Snapshots.readTableAsOf(spark, table, "huc8", firstTs)
    val asOfParts = asOf.select("huc8").distinct().collect().map(_.getString(0)).toSet
    assert(!asOfParts.contains(victim))
    assert(asOfParts == first.map(_.part).toSet - victim)
    // as of "now", everything is visible
    val nowParts = Snapshots.readTableAsOf(spark, table, "huc8", Long.MaxValue)
      .select("huc8").distinct().collect().map(_.getString(0)).toSet
    assert(nowParts == first.map(_.part).toSet)
  }

  test("manifest column stats prune partitions before any file opens") {
    val dir = Files.createTempDirectory("graft_skip").toString
    val table = s"$dir/tiles"
    val df = graft.ops.SpatialJoin.assign(spark, Synth.points(spark, sf0001))
      .select(col("pid"), col("hydroid").cast("long").as("hydroid"), col("huc8"))
    val lin = Snapshots.writeResumable(spark, df, table, "huc8", statsCol = Some("hydroid"))
    assert(lin.forall(l => !l.lo.isNaN && l.hi >= l.lo))
    // query a hydroid range that lives in few HUCs: manifest pruning must
    // drop most partitions, and the pruned read must agree with brute force
    val (qLo, qHi) = (100.0, 200.0)
    val pruned = Snapshots.readTableSkipping(spark, table, "huc8", qLo, qHi)
    val prunedParts = pruned.select("huc8").distinct().collect().map(_.getString(0)).toSet
    val keptWithData = lin.filter(l => l.hi >= qLo && l.lo <= qHi).map(_.part).toSet
    assert(prunedParts == keptWithData)
    assert(prunedParts.size < lin.size / 2, s"pruning too weak: ${prunedParts.size}/${lin.size}")
    val brute = Snapshots.readTable(spark, table)
      .filter(col("hydroid") >= qLo && col("hydroid") <= qHi).count()
    val viaPruned = pruned.filter(col("hydroid") >= qLo && col("hydroid") <= qHi).count()
    assert(brute == viaPruned)
  }

  test("curation pipeline: curate -> snapshot commit, kill one partition, resume recommits only it") {
    val dir = Files.createTempDirectory("graft_curate").toString
    val table = s"$dir/curated"
    val first = CuratePipeline.run(spark, sf0001, table)
    assert(first.nonEmpty)
    val expected = graft.ops.TextOps.curate(Synth.corpus(spark, sf0001)).count()
    assert(Snapshots.readTable(spark, table).count() == expected)
    // token-count stats recorded for skipping
    assert(first.forall(l => !l.lo.isNaN && l.hi >= l.lo))
    // kill one partition (files + manifest lines), rerun
    val victim = first.head.part
    val manifest = Paths.get(table, "_graft_manifest", "lineage.jsonl")
    val keep = Files.readAllLines(manifest).asScala
      .filterNot(_.contains(s""""part":"$victim""""))
    Files.write(manifest, keep.mkString("", "\n", "\n").getBytes)
    val partDir = Paths.get(table, s"lang=$victim")
    Snapshots.deleteRecursively(partDir)
    val second = CuratePipeline.run(spark, sf0001, table)
    assert(second.map(_.part) == Seq(victim), s"resume recommitted ${second.map(_.part)}")
    assert(Snapshots.readTable(spark, table).count() == expected)
    // observed run metrics rode the write jobs (no extra scan): one row per
    // run, corpus-level counts stable across the resume
    val m = CuratePipeline.metrics(spark, table)
      .select("curated_docs").collect().map(_.getLong(0))
    assert(m.length == 2 && m.toSet == Set(expected))
  }

  test("GeoJSON sink: one parseable Feature per dissolved extent") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_geojson").toString
    val extents = Extents.dissolve(Inundate.run(spark, sf0001))
    Extents.writeGeoJson(extents, s"$dir/extents")
    val back = spark.read.json(s"$dir/extents")
    assert(back.count() == extents.count())
    assert(back.filter(col("type") =!= "Feature").count() == 0)
    assert(back.filter(col("geometry.type") =!= "Polygon").count() == 0)
    // ring is closed (first point == last) and properties survive
    val r = back.select(col("geometry.coordinates")(0).as("ring"),
      col("properties.hydroid"), col("properties.n_cells")).head()
    val ring = r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](0)
    assert(ring.length == 5 && ring.head == ring.last)
    assert(r.getLong(2) > 0)
  }

  test("compaction execution: many small files -> one per partition, lineage fingerprints still valid") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_compactx").toString
    val table = s"$dir/tiles"
    val df = graft.ops.SpatialJoin.assign(spark, Synth.points(spark, sf0001))
      .select(col("pid"), col("hydroid").cast("long").as("hydroid"), col("huc8"))
      .repartition(4) // force several part-files per partition
    val lin = Snapshots.writeResumable(spark, df, table, "huc8")
    def fileCount(p: String) = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(table, s"huc8=$p")).iterator().asScala
        .count(_.toString.endsWith(".parquet"))
    }
    val victim = lin.map(_.part).max
    assert(fileCount(victim) > 1, "setup: expected multiple files per partition")
    val rewritten = graft.pipeline.Maintenance.compactTable(spark, table, "huc8")
    assert(rewritten.contains(victim))
    rewritten.foreach(p => assert(fileCount(p) == 1, s"partition $p not compacted"))
    // content identity: recomputed fingerprints equal the pre-compaction manifest
    val snap = Snapshots.readTable(spark, table)
    val fp = snap.groupBy(col("huc8").as("part"))
      .agg(count(lit(1)).as("rows"),
        bit_xor(Snapshots.rowHash(snap)).as("xor"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    lin.foreach { l => assert(fp(l.part) == ((l.rows, l.xor)), s"fingerprint drift at ${l.part}") }
  }

  test("compaction crash recovery: interrupted swap never doubles rows, incomplete swap keeps sources") {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_compcrash").toString
    val table = s"$dir/tiles"
    val df = graft.ops.SpatialJoin.assign(spark, Synth.points(spark, sf0001))
      .select(col("pid"), col("hydroid").cast("long").as("hydroid"), col("huc8"))
      .repartition(4)
    val lin = Snapshots.writeResumable(spark, df, table, "huc8")
    val victim = lin.map(_.part).max
    val nRows = lin.find(_.part == victim).get.rows
    val vdir = Paths.get(table, s"huc8=$victim")
    def parquets() = Files.list(vdir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq

    // simulate a crash BETWEEN the rename and the source delete (window 4-5):
    // compacted target + intent present, sources still on disk
    val sources = parquets().map(_.getFileName.toString)
    spark.read.parquet(vdir.toString).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/staged")
    val staged = Files.list(Paths.get(s"$dir/staged")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.head
    Files.move(staged, vdir.resolve("compacted-42.parquet"))
    Files.write(vdir.resolve("compact-intent-42.json"),
      ("compacted-42.parquet" +: sources).mkString("\n").getBytes("UTF-8"))
    assert(parquets().size == sources.size + 1, "crash state: duplicate visible")

    // the next compaction run must RECOVER (delete exactly the listed
    // sources) before reading anything — rows must come out exact, once
    graft.pipeline.Maintenance.compactTable(spark, table, "huc8")
    assert(spark.read.parquet(vdir.toString).count() == nRows,
      "rows doubled or lost after crash recovery")
    assert(parquets().size == 1)

    // simulate a crash BEFORE the rename (window 3-4): intent + tmp only —
    // recovery must drop both and keep the sources authoritative
    Files.write(vdir.resolve("compact-intent-77.json"),
      "compacted-77.parquet\ncompacted-42.parquet".getBytes("UTF-8"))
    Files.write(vdir.resolve("compacted-77.parquet.tmp"), Array[Byte](1, 2, 3))
    graft.pipeline.Maintenance.compactTable(spark, table, "huc8")
    assert(spark.read.parquet(vdir.toString).count() == nRows)
    assert(!Files.exists(vdir.resolve("compact-intent-77.json")))
    assert(!Files.exists(vdir.resolve("compacted-77.parquet.tmp")))

    // simulate a TORN intent (crash mid-write before durability: zero bytes /
    // garbage / target-only) — recovery must discard it without throwing and
    // without deleting any source
    Files.write(vdir.resolve("compact-intent-88.json"), Array.empty[Byte])
    Files.write(vdir.resolve("compact-intent-89.json"),
      "not-a-target-name".getBytes("UTF-8"))
    Files.write(vdir.resolve("compact-intent-90.json"),
      "compacted-90.parquet".getBytes("UTF-8")) // no source list
    graft.pipeline.Maintenance.compactTable(spark, table, "huc8")
    assert(spark.read.parquet(vdir.toString).count() == nRows)
    Seq("compact-intent-88.json", "compact-intent-89.json", "compact-intent-90.json")
      .foreach(n => assert(!Files.exists(vdir.resolve(n)), s"$n not cleaned"))
  }

  test("AvailableNow catch-up: streaming agg over the snapshot backlog terminates by itself") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_catchup").toString
    val table = s"$dir/curated"
    CuratePipeline.run(spark, sf0001, table)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_tokens", IntegerType),
      StructField("mean_word_len", DoubleType), StructField("stop_ratio", DoubleType),
      StructField("text", StringType), StructField("lang", StringType)))
    val q = graft.streaming.CorpusStream.catchUpCounts(spark, table, schema, "catchup")
    q.awaitTermination(60000) // AvailableNow stops on its own
    assert(!q.isActive)
    val streamed = spark.sql("SELECT sum(n_docs) FROM catchup").collect()(0).getLong(0)
    assert(streamed == Snapshots.readTable(spark, table).count())
  }

  test("schema evolution: old partitions surface a later-added column as NULL, no rewrite") {
    val dir = Files.createTempDirectory("graft_evo").toString
    val table = s"$dir/tiles"
    val base = graft.ops.SpatialJoin.assign(spark, Synth.points(spark, sf0001))
      .select(col("pid"), col("hydroid").cast("long").as("hydroid"), col("huc8"))
    // epoch 1: two partitions, v1 schema (no depth column)
    val parts = base.select("huc8").distinct().limit(2)
      .collect().map(_.getString(0)).toSeq
    val v1 = base.filter(col("huc8") === parts.head)
    Snapshots.writeResumable(spark, v1, table, "huc8")
    // epoch 2: another partition arrives with an added column
    val v2 = base.filter(col("huc8") === parts(1))
      .withColumn("depth", col("hydroid") * 0.5)
    Snapshots.writeResumable(spark, v2, table, "huc8")
    val evolved = Snapshots.readTableEvolved(spark, table)
    assert(evolved.columns.contains("depth"))
    // old partition reads depth as NULL; new partition carries values
    assert(evolved.filter(col("huc8") === parts.head && col("depth").isNotNull).count() == 0)
    assert(evolved.filter(col("huc8") === parts(1) && col("depth").isNull).count() == 0)
    // both epochs fully readable: row counts survive evolution
    assert(evolved.count() == v1.count() + v2.count())
  }
}
