package org.apache.spark.sql

/** Accessor for the classic session's `private[sql] cloneSession()` —
  * the one Spark API that copies the FULL session state (conf, temp
  * views, registered functions, listener-independent) into an isolated
  * sibling sharing the SparkContext. `graft.plans.SetHint` uses it to
  * give `Set(...)` hints a true statement-lifetime conf scope under AQE
  * (see the scaladoc there); nothing else should.
  *
  * This file lives in the `org.apache.spark.sql` package solely to
  * satisfy the `private[sql]` access qualifier of a public-source Spark
  * method (sql/core `SparkSession.cloneSession`, upstream). It contains
  * no Spark-internal logic of its own.
  */
object GraftSessionClone {
  def cloneSession(s: SparkSession): SparkSession = s match {
    case c: classic.SparkSession => c.cloneSession()
    // non-classic (e.g. connect) sessions have no clone; a fresh session
    // shares none of the state we need — fail loudly rather than run the
    // statement against the wrong catalog
    case other => throw new UnsupportedOperationException(
      s"statement-scoped clone requires a classic SparkSession, got " +
        other.getClass.getName)
  }
}
