package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** The v17 build/serve split: the IVF-PQ index persists as a parquet
  * artifact (cells + routing centroids + PQ codebooks), the serve path
  * reads ONLY the artifact (no Lloyd iteration, no in-session memo),
  * and serving from disk is bit-equal to v12's in-session index — the
  * build-once / serve-many contract a deployment relies on.
  */
class AnnIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("v17 artifact holds all three relations and serve equals v12 exactly") {
    val served = VectorOps.annIndexServe(spark, dir).collect()
    val idx = VectorOps.annIndexPath(spark, dir)
    // the artifact is complete on disk
    Seq("cells", "centroids", "codebooks", "_INDEX_READY").foreach(p =>
      assert(Files.exists(idx.resolve(p)), s"missing artifact piece $p"))
    // cells carry every corpus vector at 4 codes each
    val cells = spark.read.parquet(idx.resolve("cells").toString)
    assert(cells.columns.sorted.toSeq ===
      Seq("c0", "c1", "c2", "c3", "c_id", "cluster"))
    assert(cells.count() ===
      spark.read.parquet(s"$dir/embeddings.parquet").count())
    // serving from the written artifact = the in-session index (v12)
    val v12 = VectorOps.pqIvfSearch(spark, dir).collect()
    assert(served.map(_.toSeq.toVector).toSeq ===
      v12.map(_.toSeq.toVector).toSeq)
  }

  test("v17 build is idempotent: a second serve reuses the artifact unmodified") {
    VectorOps.annIndexServe(spark, dir).collect()
    val marker = VectorOps.annIndexPath(spark, dir).resolve("_INDEX_READY")
    val t0 = Files.getLastModifiedTime(marker)
    val again = VectorOps.annIndexServe(spark, dir).collect()
    assert(Files.getLastModifiedTime(marker) === t0,
      "the artifact must not rebuild when the input is unchanged")
    assert(again.nonEmpty)
  }
}
