package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.catalyst.optimizer.BuildLeft

/** Dev probe: list every registered query that plans a BNLJ and dump the
  * build side's node names (feeds RegistrySpec's justification map). */
object BnljProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case other => other.children.flatMap(flatten)
    })
    val sfDir = "/root/testdata/sf0.001"
    graft.Registry.all.foreach { d =>
      try {
        val plan = d.fn(spark, sfDir).queryExecution.executedPlan
        val bnljs = flatten(plan).collect { case j: BroadcastNestedLoopJoinExec => j }
        if (bnljs.nonEmpty) {
          println(s"BNLJ ${d.name} n=${bnljs.size}")
          bnljs.foreach { j =>
            val build = if (j.buildSide == BuildLeft) j.left else j.right
            println(s"  build: ${flatten(build).map(_.nodeName).mkString(" | ")}")
          }
        }
      } catch { case e: Throwable => println(s"ERR ${d.name}: ${e.getMessage}") }
    }
    spark.stop()
  }
}
