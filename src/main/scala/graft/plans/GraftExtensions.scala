package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftFunctions

/** SparkSessionExtensions entry point — enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Injects the graft
  * native function library (`cosine_sim`, `simhash128`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(e.injectFunction)
}
