package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.linkage.Cluster

/** Connected components: known graphs, singleton semantics
  * (households.py:247–249), GraphX cross-check, checkpoint resume. */
class ClusterSpec extends AnyFunSuite with SparkFixture {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    Cluster.connectedComponents(spark, df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components + chain") {
    // chain 1-2-3-4, pair 10-11
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
    assert(labels(2L) == 1L && labels(3L) == 1L && labels(4L) == 1L)
    assert(labels(11L) == 10L)
    assert(!labels.contains(1L) || labels(1L) == 1L)
  }

  test("star graph with high-degree hub") {
    val labels = cc((2L to 200L).map(i => (100L, i)) :+ (1L, 100L))
    assert((2L to 200L).forall(i => labels.getOrElse(i, i) == 1L))
  }

  test("duplicate and reversed edges collapse") {
    val labels = cc(Seq((5L, 6L), (6L, 5L), (5L, 6L), (6L, 7L)))
    assert(labels(6L) == 5L && labels(7L) == 5L)
  }

  test("matches GraphX ConnectedComponents on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = (0 until 500).map(_ =>
      (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
    val ours = cc(edges)
    val gx = org.apache.spark.graphx.Graph
      .fromEdgeTuples(spark.sparkContext.parallelize(edges), 0)
    val gxLabels = org.apache.spark.graphx.lib.ConnectedComponents
      .run(gx).vertices.collect().toMap
    // same partition: nodes grouped identically (labels may differ)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    def groupOf(m: Map[Long, Long], n: Long) = m.getOrElse(n, n)
    val oursGroups = nodes.groupBy(groupOf(ours, _)).values
      .map(_.toSet).toSet
    val gxGroups = nodes.groupBy(n => gxLabels(n)).values
      .map(_.toSet).toSet
    assert(oursGroups == gxGroups)
  }

  test("string node ids cluster identically (the >10⁹-records id domain)") {
    import spark.implicits._
    // same topology as "two components + chain", over conv_id strings —
    // every per-round op (greatest/least/min/join/distinct) is
    // type-generic, so no hashing to 64-bit is required
    val edges = Seq(("c1", "c2"), ("c2", "c3"), ("c3", "c4"), ("x10", "x11"))
      .toDF("a", "b")
    val labels = Cluster.connectedComponents(spark, edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Seq("c2", "c3", "c4").forall(labels(_) == "c1"))
    assert(labels("x11") == "x10")
    // and through the Pipeline config switch: conv_id-string nodes give
    // the same clusters as the default hashed-id path
    val t = linkage.SynthTranscripts.transcripts(spark,
      linkage.SynthTranscripts.Config(seed = 11L, nConvs = 150, days = 5)).toDF
    val hashed = linkage.Pipeline.run(spark, t)
    val strings = linkage.Pipeline.run(spark, t,
      linkage.Pipeline.Config(hashNodeIds = false))
    val a = hashed.labeledRecords.select("conv_id", "cluster_id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = strings.labeledRecords.select("conv_id", "cluster_id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a == b)
    hashed.unpersist(); strings.unpersist()
  }

  test("resume from checkpoint reproduces identical labels") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val edges = (1L to 50L).map(i => (i, i + 1L)) ++ Seq((200L, 201L))
    val df = edges.toDF("a", "b")
    val full = Cluster.connectedComponents(spark, df,
      Cluster.Options(checkpointDir = Some(dir)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // second run finds _cc_state.json from the completed run and resumes
    // from the final round — labels must be identical
    val resumed = Cluster.connectedComponents(spark, df,
      Cluster.Options(checkpointDir = Some(dir)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == resumed)
    // and a partial-state resume: rewind the state to iter 0 (keeping the
    // input fingerprint intact), keep round files → resume mid-computation
    val state = new java.io.File(s"$dir/_cc_state.json")
    // drop hadoop LocalFileSystem's checksum sidecar before tampering
    new java.io.File(s"$dir/._cc_state.json.crc").delete()
    val stateTxt = java.nio.file.Files.readString(state.toPath)
    java.nio.file.Files.writeString(state.toPath,
      stateTxt.replaceAll(""""last_completed_iter":\s*\d+""",
        "\"last_completed_iter\": 0"))
    val midResumed = Cluster.connectedComponents(spark, df,
      Cluster.Options(checkpointDir = Some(dir)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == midResumed)
  }

  test("resume against a checkpoint from DIFFERENT edges re-inits fresh") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc-stale").toString
    val first = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    Cluster.connectedComponents(spark, first,
      Cluster.Options(checkpointDir = Some(dir))).count()
    // same checkpoint dir, different input: the stored fingerprint must
    // not match, so the run re-inits instead of emitting stale clusters
    val second = Seq((10L, 11L), (12L, 13L)).toDF("a", "b")
    val labels = Cluster.connectedComponents(spark, second,
      Cluster.Options(checkpointDir = Some(dir)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(11L -> 10L, 10L -> 10L, 13L -> 12L, 12L -> 12L))
  }
}
