package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Engine-native replacement for the reference's orchestration surface
  * (SURVEY.md §2.D): the Airflow DAG
  * (`/root/reference/dags/indicadores_titanic.py:126-138`) declares
  * tasks wired with `>>`; here a [[Pipeline]] is stages with explicit
  * dependencies executed in topological order inside one Spark
  * application. Cluster provision/teardown (D2/D6) collapses to the
  * caller's SparkSession lifecycle; waiters (D3/D5) become synchronous
  * execution with per-stage timing; Airflow Variables (D7) become the
  * typed config the caller closes over.
  */
final case class Stage(name: String, deps: Seq[String] = Nil)(
    val run: SparkSession => Unit)

final case class StageResult(name: String, seconds: Double, error: Option[Throwable]) {
  def ok: Boolean = error.isEmpty
}

final case class PipelineReport(results: Seq[StageResult]) {
  def ok: Boolean = results.forall(_.ok)
  def seconds: Double = results.map(_.seconds).sum
}

final class Pipeline(stages: Seq[Stage]) {
  require(stages.map(_.name).distinct.size == stages.size,
    "duplicate stage names")
  stages.foreach { s =>
    val unknown = s.deps.filterNot(stages.map(_.name).contains)
    require(unknown.isEmpty, s"stage ${s.name}: unknown deps $unknown")
  }

  /** Stages in dependency order (stable: declaration order breaks ties). */
  def ordered: Seq[Stage] = {
    val byName = stages.map(s => s.name -> s).toMap
    val done = scala.collection.mutable.LinkedHashSet.empty[String]
    val visiting = scala.collection.mutable.Set.empty[String]
    def visit(n: String): Unit = {
      if (done.contains(n)) return
      require(visiting.add(n), s"dependency cycle through stage '$n'")
      byName(n).deps.foreach(visit)
      visiting.remove(n)
      done.add(n)
    }
    stages.foreach(s => visit(s.name))
    done.toSeq.map(byName)
  }

  /** Run all stages; fail-fast (stages after a failure are not run),
    * mirroring Airflow's default trigger rule.
    */
  def execute(spark: SparkSession): PipelineReport = {
    val results = scala.collection.mutable.ArrayBuffer.empty[StageResult]
    var failed = false
    ordered.foreach { s =>
      if (!failed) {
        val t0 = System.nanoTime()
        val err = try { s.run(spark); None } catch { case e: Throwable => Some(e) }
        results += StageResult(s.name, (System.nanoTime() - t0) / 1e9, err)
        failed = err.isDefined
      }
    }
    PipelineReport(results.toSeq)
  }
}
