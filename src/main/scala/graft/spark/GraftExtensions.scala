package graft.spark

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Config-based installation of the sketch function surface:
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.spark.GraftExtensions ...
 *   // or
 *   SparkSession.builder().withExtensions(new GraftExtensions) ...
 * }}}
 *
 * Registration happens on first session use via an injected rule hook (the
 * function registry is per-session; injectFunction would require expression
 * builders, while the udaf-backed functions register through the session's
 * UDF registry — both end up SQL-callable).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    // A resolution rule runs with a session handle before analysis; use the
    // first invocation to install the UDF/UDAF registry entries idempotently.
    extensions.injectResolutionRule { session =>
      if (!GraftExtensions.installed.contains(session)) {
        GraftExtensions.installed.synchronized {
          if (!GraftExtensions.installed.contains(session)) {
            functions.registerAll(session)
            GraftExtensions.installed.add(session)
          }
        }
      }
      new org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
        override def apply(
            plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
            : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = plan
      }
    }
  }
}

object GraftExtensions {
  private val installed =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())
}
