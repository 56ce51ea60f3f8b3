package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of suite-shared materialized relations — localCheckpointed
  * DataFrames built once per (application, fixture dir) and reused by
  * several declared queries (the BM25 postings/scores consumed by
  * q94/q100/q195/q207 are the canonical case). The Bench/Verify
  * harnesses sweep every persistent RDD between queries to stop dead
  * checkpoint blocks from evicting live shuffle memory; relations
  * registered here are the exception — they are deliberately alive
  * across queries, so the sweeps skip their RDD ids.
  *
  * Memory bound: entries are index-sized (queries × matched docs for
  * BM25), never corpus-sized, and there is one per dataset dir per
  * process — the same amortization a real search engine gets from
  * keeping its inverted index resident across queries.
  *
  * The registry is keyed by (applicationId, rddId), not rddId alone:
  * RDD ids restart at 0 per SparkContext, so in a JVM that runs several
  * sessions sequentially (the sbt test suite does) a bare-id registry
  * would alias fresh unrelated RDDs in a later context and silently
  * shield them from the sweep.
  *
  * Builds are named and timed so the bench can report the one-time
  * shared-build cost as its own `shared:<name>` line item — otherwise
  * the cost lands only in rep 1 of whichever payer runs first and the
  * median-of-3 protocol makes it invisible in the suite total.
  */
object SharedRelations {
  private val ids =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int)]()
  private val builds =
    scala.collection.concurrent.TrieMap[(String, String), Double]()

  /** RDD ids (within the session's application) the inter-query sweeps
    * must not unpersist.
    */
  def isShared(spark: SparkSession, id: Int): Boolean =
    ids.contains((spark.sparkContext.applicationId, id))

  /** Build-and-register: runs `build` (expected to end in
    * `.localCheckpoint()`), records whatever persistent RDDs the build
    * pinned so the harness sweeps keep them alive, and records the
    * build's wall-clock under `name` for [[buildSeconds]]. Callers
    * memoize the returned DataFrame themselves (keyed by app + dir).
    * Harness runs are sequential, so the before/after snapshot cannot
    * capture another query's blocks.
    */
  def checkpointShared(spark: SparkSession, name: String)
      (build: => DataFrame): DataFrame = {
    val app = spark.sparkContext.applicationId
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val t0 = System.nanoTime()
    val df = build
    val secs = (System.nanoTime() - t0) / 1e9
    // a name can be built once per fixture dir; sum if a second fixture
    // pays the same build in one app (Bench never does — one sfDir)
    builds.updateWith((app, name)) {
      case Some(s) => Some(s + secs)
      case None    => Some(secs)
    }
    val after = spark.sparkContext.getPersistentRDDs.keySet
    (after -- before).foreach(id => ids.add((app, id)))
    df
  }

  /** Timing-only variant for one-time SIDE-EFFECT builds (e.g. seeding
    * a versioned table on disk): records the build's wall-clock under
    * `name` for [[buildSeconds]] like [[checkpointShared]], but pins no
    * RDDs — the artifact lives outside the block manager, so the
    * harness sweeps have nothing to skip.
    */
  def timeShared[T](spark: SparkSession, name: String)(build: => T): T = {
    val app = spark.sparkContext.applicationId
    val t0 = System.nanoTime()
    val r = build
    val secs = (System.nanoTime() - t0) / 1e9
    builds.updateWith((app, name)) {
      case Some(s) => Some(s + secs)
      case None    => Some(secs)
    }
    r
  }

  /** Wall-clock seconds each named shared build cost in this
    * application — the bench folds these into its total as
    * `shared:<name>` rows so the amortized cost stays visible.
    */
  def buildSeconds(spark: SparkSession): Map[String, Double] = {
    val app = spark.sparkContext.applicationId
    builds.collect {
      case ((a, name), secs) if a == app => name -> secs
    }.toMap
  }
}
