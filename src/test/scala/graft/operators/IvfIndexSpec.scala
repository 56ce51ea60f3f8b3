package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** IVF index on planted clusters: the index must place cluster members
  * in the same list (mostly) and search must recover true neighbors at
  * a fraction of the scan cost.
  */
class IvfIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dim = 16
  private val nClusters = 8
  private val perCluster = 40

  override def beforeAll(): Unit = {
    spark = GraftSession.local("ivf-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("cluster", IntegerType)))

  /** Well-separated gaussian clusters: centers ~N(0,1), points = center
    * + N(0,0.05) noise → intra-cluster cosine ≫ inter-cluster.
    */
  private def clustered(): DataFrame = {
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield Row(
      (c * perCluster + i).toLong,
      centers(c).map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq,
      c)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), schema)
  }

  test("build groups planted clusters into coherent lists") {
    val data = clustered()
    val ivf = IvfIndex.build(data, "vec_id", "embedding", dim,
      nLists = nClusters, iterations = 3)
    // each true cluster should be dominated by a single list
    val purity = ivf.assignments
      .join(data.select(col("vec_id").as("__id"), col("cluster")), Seq("__id"))
      .groupBy(col("cluster"), col("list_id")).agg(count(lit(1)).as("n"))
      .groupBy(col("cluster")).agg(max(col("n")).as("dominant"))
      .collect().map(r => r.getLong(1).toDouble / perCluster)
    assert(purity.forall(_ >= 0.9), s"cluster purity too low: ${purity.toSeq}")
  }

  test("search recovers brute-force top-k with nProbe=2") {
    val data = clustered()
    val ivf = IvfIndex.build(data, "vec_id", "embedding", dim,
      nLists = nClusters, iterations = 3)
    val queries = data.where(col("vec_id") % 37 === 0) // a few per cluster
    val got = IvfIndex.search(ivf, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }

    // brute-force baseline: full cross join + exact rank
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    val brute = data.select(col("vec_id"), col("embedding").as("ce"))
      .crossJoin(broadcast(queries.select(
        col("vec_id").as("query_id"), col("embedding").as("qe"))))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.GraftFunctions
          .cosineSimilarity(col("ce"), col("qe")).as("cos_sim"))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("rank") <= 5)
    val want = brute.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }

    val recalls = want.map { case (q, wset) =>
      got.get(q).map(g => g.intersect(wset).size.toDouble / wset.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"IVF recall@5 $mean")
  }

  test("probing fewer lists scans fewer candidates") {
    val data = clustered()
    val ivf = IvfIndex.build(data, "vec_id", "embedding", dim,
      nLists = nClusters, iterations = 2)
    // with nProbe=2 of 8 lists, per-query candidate pool ≈ 2/8 of corpus
    val listSizes = ivf.assignments.groupBy("list_id").count()
      .collect().map(_.getLong(1))
    assert(listSizes.sum === (nClusters * perCluster).toLong)
    assert(listSizes.max < nClusters * perCluster, "degenerate single list")
  }
}
