package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Embedding clustering semantics on planted geometry — the oracles
  * (q161/q162) prove cross-engine equality on the fixture; these pin
  * the geometric behavior the fixture can't assert (separation ⇒
  * silhouette near 1, k-means recovering planted clusters, empty-
  * cluster drop, determinism).
  */
class ClusteringSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("clustering-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // three well-separated directions in 4-d, n points each around axis
  private def planted(n: Int): Seq[(Long, Seq[Float], Int)] = {
    val axes = Seq(
      Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f), Seq(0f, 0f, 1f, 0f))
    for (i <- 0 until (3 * n)) yield {
      val lab = i % 3
      val base = axes(lab)
      // small deterministic wobble in the last coordinate
      val wob = 0.01f * ((i / 3) % 5)
      (i.toLong, base.init :+ wob, lab)
    }
  }

  test("cosineSilhouette: separated labels near 1, scrambled labels poor") {
    val sp = spark; import sp.implicits._
    val good = planted(12).toDF("vec_id", "embedding", "label")
    val sGood = Clustering.cosineSilhouette(good, "vec_id", "embedding",
      "label", dim = 4).collect()
    assert(sGood.length === 3)
    sGood.foreach { r =>
      assert(r.getAs[Long]("n") === 12L)
      assert(r.getAs[Double]("avg_silhouette") > 0.8,
        s"separated label ${r.get(0)} scored ${r.get(2)}")
    }
    // scramble: labels no longer track the true directions — every
    // label's centroid drifts toward the global mean, silhouette drops
    val scrambled = planted(12).map { case (id, v, _) => (id, v, ((id / 3) % 3).toInt) }
      .toDF("vec_id", "embedding", "label")
    val sBad = Clustering.cosineSilhouette(scrambled, "vec_id", "embedding",
      "label", dim = 4).collect()
    sBad.foreach(r => assert(r.getAs[Double]("avg_silhouette") < 0.3))
  }

  test("sphericalKMeans: recovers planted clusters, deterministic") {
    val sp = spark; import sp.implicits._
    val pts = planted(12).map { case (id, v, _) => (id, v) }
      .toDF("vec_id", "embedding")
    val out = Clustering.sphericalKMeans(pts, "vec_id", "embedding",
      k = 3, iterations = 3, dim = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    // seeds 0,1,2 are one per direction → three clusters of 12, all
    // tight (avg cosine to centroid near 1)
    assert(out.map(_._2._1).sorted.toSeq === Seq(12L, 12L, 12L))
    out.foreach { case (_, (_, cohesion)) => assert(cohesion > 0.95) }
    val again = Clustering.sphericalKMeans(pts, "vec_id", "embedding",
      k = 3, iterations = 3, dim = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    assert(again.toMap === out.toMap)
  }

  test("sphericalKMeans: a cluster that loses every point drops out") {
    val sp = spark; import sp.implicits._
    // seeds 0 and 1 both lie on the SAME axis (duplicate direction):
    // every point prefers seed 0 on the cosine tie (cluster-id
    // tiebreak), so cluster 1 is empty after round 1 and disappears
    val pts = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(1f, 0.1f, 0f, 0f)), (3L, Seq(1f, 0f, 0.1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.sphericalKMeans(pts, "vec_id", "embedding",
      k = 2, iterations = 2, dim = 4).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L))
    assert(out.head.getLong(1) === 4L)
  }

  test("productQuantize: per-block codes, exact reconstruction on block-constant data") {
    val sp = spark; import sp.implicits._
    // 8-dim vectors, m=2 blocks of 4: each block takes one of two
    // exactly-repeated subvector patterns → after training, every
    // centroid coincides with a pattern and qerr is exactly 0; codes
    // agree for vectors sharing the pattern
    val pa = Seq(1f, 2f, 3f, 4f); val pb = Seq(9f, 8f, 7f, 6f)
    val qa = Seq(0f, 1f, 0f, 1f); val qb = Seq(5f, 5f, 5f, 5f)
    val pts = (0L until 12L).map { i =>
      val left = if (i % 2 == 0) pa else pb
      val right = if (i % 3 == 0) qa else qb
      (i, left ++ right)
    }.toDF("vec_id", "embedding")
    val out = Clustering.productQuantize(pts, "vec_id", "embedding",
      m = 2, subDim = 4, ks = 2, iterations = 2).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.size === 12)
    out.foreach { case (id, (_, _, qerr)) =>
      assert(qerr === 0.0, s"vec $id reconstructs inexactly: $qerr") }
    // same left pattern → same code_0; likewise right → code_1
    (0L until 12L by 2).foreach(i => assert(out(i)._1 === out(0L)._1))
    (1L until 12L by 2).foreach(i => assert(out(i)._1 === out(1L)._1))
    assert(out(0L)._1 !== out(1L)._1)
    (0L until 12L by 3).foreach(i => assert(out(i)._2 === out(0L)._2))
    // codes stay inside the ks-codebook range
    out.values.foreach { case (c0, c1, _) =>
      assert(c0 >= 0 && c0 < 2 && c1 >= 0 && c1 < 2) }
  }

  test("ivfPqTopK: planted twins surface at rank 1 with full exact-recall") {
    val sp = spark; import sp.implicits._
    // 3 tight planted clusters in 8-d (m=2 blocks of 4): each query's
    // nearest neighbors are its own cluster, which shares its coarse
    // list AND its PQ codes — IVF-PQ must return cluster-mates and the
    // exact-top-k flag must agree
    val rnd = new scala.util.Random(270)
    val axes = Seq(Seq(10f, 0f, 0f, 0f), Seq(0f, 10f, 0f, 0f),
      Seq(0f, 0f, 10f, 0f))
    val pts = (0L until 30L).map { i =>
      val ax = axes((i % 3).toInt)
      val wob = Seq.fill(4)(rnd.nextFloat() * 0.1f)
      (i, (ax.zip(wob).map { case (a, w) => a + w }) ++
        (ax.zip(wob).map { case (a, w) => a - w }))
    }.toDF("vec_id", "embedding")
    val vecs = pts.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val out = Clustering.ivfPqTopK(pts, "vec_id", "embedding",
      org.apache.spark.sql.functions.col("vec_id") < 3,
      nlist = 3, nprobe = 1, m = 2, subDim = 4,
      ks = 3, iterations = 2, topK = 3).collect()
    assert(out.length === 9) // 3 queries x top-3
    // exact L2 top-3 computed locally: the in_exact_topk flag must be
    // CORRECT row by row (within a tight cluster all members share PQ
    // codes, so ADC legitimately cannot order them — the flag is the
    // honest readout of what the compression cost)
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    val exactTop = (0L until 3L).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(c => (math.rint(l2(vecs(q), vecs(c)) * 1e6) / 1e6, c))
        .take(3).toSet
    }.toMap
    out.foreach { r =>
      val q = r.getLong(0); val cand = r.getLong(2)
      assert(cand % 3 === q % 3,
        s"query $q pulled cross-cluster candidate $cand")
      assert(r.getAs[Boolean]("in_exact_topk") === exactTop(q).contains(cand),
        s"query $q cand $cand: exact-hit flag wrong")
    }
    // cluster-mates share codes -> identical ADC -> id-ascending ranks
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getLong(2))
      assert(byRank === byRank.sorted, s"query $q: tie order not by id")
    }
  }

  test("pqBucketDedup: identical vectors bucket together at cos 1, members recovered") {
    val sp = spark; import sp.implicits._
    // three exact triplicates + distinct singletons: each triplicate is
    // one bucket (identical codes), 3 members -> 3 pairs, all cos 1.0
    val base = Seq(
      Seq.fill(8)(1f), Seq.tabulate(8)(i => i.toFloat),
      Seq.tabulate(8)(i => (8 - i).toFloat))
    val pts = (0L until 9L).map(i => (i, base((i % 3).toInt)))
      .toDF("vec_id", "embedding")
    val out = Clustering.pqBucketDedup(pts, "vec_id", "embedding",
      m = 2, subDim = 4, ks = 3, iterations = 2, threshold = 0.99)
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_members") === 3L)
      assert(r.getAs[Long]("n_pairs") === 3L)
      assert(r.getAs[Long]("n_dups") === 3L)
      assert(r.getAs[Double]("avg_cos") === 1.0)
    }
  }

  test("embeddingOutliers: off-cluster vector flags, cluster members don't") {
    val sp = spark; import sp.implicits._
    // label 0 points hug +x; one planted ANTI-aligned vector (-x) is
    // the outlier; label 1 hugs +y and stays clean
    val pts = (
      (0L to 7L).map(i => (i, Seq(1f, 0.01f * i, 0f, 0f), 0)) ++
        Seq((8L, Seq(-1f, 0f, 0f, 0f), 0)) ++
        (9L to 14L).map(i => (i, Seq(0f, 1f, 0.01f * (i - 9), 0f), 1))
    ).toDF("vec_id", "embedding", "label")
    val out = Clustering.embeddingOutliers(pts, "vec_id", "embedding",
      "label", dim = 4, threshold = 0.1).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("cos_centroid"), r.getAs[Boolean]("is_outlier")))
      .toMap
    assert(out.size === 15)
    assert(out(8L)._2, s"anti-aligned vector must flag, cos=${out(8L)._1}")
    assert(out(8L)._1 < 0.0)
    (out - 8L).foreach { case (id, (cos, flag)) =>
      assert(!flag && cos > 0.9, s"vec $id should be clean, cos=$cos")
    }
  }

  test("gridDbscan: planted blobs, border attaches to min cluster, cross-cell pairs, noise") {
    val sp = spark; import sp.implicits._
    // eps=1, minPts=3. Blob A {1,2,3} tight triangle → all core.
    // Point 4 at (1.2, 0): within eps of core 2 only (2 neighbors incl
    // self < minPts) → border of A. Blob B {10,11} straddles the cell
    // boundary at x=1·eps (0.95 vs 1.05 land in DIFFERENT grid cells,
    // distance 0.1) — plus 12 nearby → core; pairs MUST cross cells.
    // Point 99 far away → noise.
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.0, 0.5),
      (4L, 1.2, 0.0),
      (10L, 0.95, 5.0), (11L, 1.05, 5.0), (12L, 1.0, 5.5),
      (99L, 50.0, 50.0)
    ).toDF("vec_id", "x", "y")
    val out = Clustering.gridDbscan(pts, "vec_id", eps = 1.0, minPts = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("role"), r.getAs[Long]("cluster"))).toMap
    assert(out(1L) === (("core", 1L)))
    assert(out(2L) === (("core", 1L)))
    assert(out(3L) === (("core", 1L)))
    assert(out(4L) === (("border", 1L)))
    assert(out(10L) === (("core", 10L)))
    assert(out(11L) === (("core", 10L)))
    assert(out(12L) === (("core", 10L)))
    assert(out(99L) === (("noise", -1L)))
  }

  test("cTfIdfKeywords: hand-computed scores; within-class tf beats corpus-common terms") {
    val sp = spark; import sp.implicits._
    // class 1: "apple apple banana" (size 3), class 2: "carrot" (size 1)
    // A = 2; f: apple 2, banana 1, carrot 1
    // score(1, apple) = 2·ln(1 + 2/2), score(1, banana) = ln(3),
    // score(2, carrot) = ln(3)
    val docs = Seq((1, "apple apple banana"), (2, "carrot"))
      .toDF("label", "text")
    val out = Clustering.cTfIdfKeywords(docs, "label", "text", k = 5)
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[String]("term")) ->
        (r.getAs[Long]("rank"), r.getAs[Double]("score"))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((1, "apple")) === ((1L, r6(2 * math.log(2.0)))))
    assert(out((1, "banana")) === ((2L, r6(math.log(3.0)))))
    assert(out((2, "carrot")) === ((1L, r6(math.log(3.0)))))
    assert(out.size === 3)
    // k truncation: a class with 6 distinct terms keeps only 5
    val wide = Seq((1, "t1 t2 t3 t4 t5 t6")).toDF("label", "text")
    assert(Clustering.cTfIdfKeywords(wide, "label", "text", k = 5)
      .count() === 5L)
  }

  test("fused ivfPqTrain PQ blocks replay productQuantize exactly (the shared-codebook pin)") {
    val sp = spark; import sp.implicits._
    // the q268/q270/q274 sharing argument: blocks train independently,
    // so the fused (PQ + coarse) trainer's blocks 0..m-1 must yield the
    // same codebooks — and an encode against them the same codes/qerr —
    // as the standalone q268-config trainer. Fixture deliberately NOT
    // block-constant (wobble) so centroids are non-trivial.
    val rnd = new scala.util.Random(274)
    val pa = Seq(1f, 2f, 3f, 4f); val pb = Seq(9f, 8f, 7f, 6f)
    val pts = (0L until 18L).map { i =>
      val base = (if (i % 2 == 0) pa else pb) ++ (if (i % 3 == 0) pa else pb)
      (i, base.map(_ + rnd.nextFloat() * 0.3f))
    }.toDF("vec_id", "embedding")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val direct = Clustering.productQuantize(pts, "vec_id", "embedding",
      m = 2, subDim = 4, ks = 2, iterations = 2).collect().map(key).sorted
    val cb = Clustering.ivfPqTrain(pts, "vec_id", "embedding",
      nlist = 3, m = 2, subDim = 4, ks = 2, iterations = 2)
    val viaFused = Clustering.pqCodesFrom(pts, "vec_id", "embedding",
      m = 2, subDim = 4,
      cb.where(org.apache.spark.sql.functions.col("__block") < 2))
      .collect().map(key).sorted
    assert(viaFused === direct)
    // and the split search half must replay the one-shot ivfPqTopK
    val viaSplit = Clustering.ivfPqSearch(pts, "vec_id", "embedding",
      org.apache.spark.sql.functions.col("vec_id") < 2,
      nprobe = 1, m = 2, subDim = 4, topK = 3, cb)
      .collect().map(_.toSeq).sortBy(_.toString)
    val oneShot = Clustering.ivfPqTopK(pts, "vec_id", "embedding",
      org.apache.spark.sql.functions.col("vec_id") < 2,
      nlist = 3, nprobe = 1, m = 2, subDim = 4, ks = 2, iterations = 2,
      topK = 3).collect().map(_.toSeq).sortBy(_.toString)
    assert(viaSplit === oneShot)
  }
}
