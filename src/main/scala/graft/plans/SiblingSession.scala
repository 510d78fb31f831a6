package graft.plans

import org.apache.spark.SparkContext
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.classic

/** Constructs a sibling SparkSession carrying its own
  * [[SparkSessionExtensions]] on an already-running SparkContext,
  * WITHOUT touching the JVM-global default/active session registry.
  *
  * Why not `SparkSession.builder().withExtensions(...).getOrCreate()`:
  * with a default session already registered, getOrCreate returns it
  * and silently drops the extensions; the only builder-API workaround
  * is clearing the global default/active sessions first, which opens a
  * window where ANY concurrent thread resolving `SparkSession.active`
  * (Spark does this internally in encoder/UDF resolution) sees no
  * session or the wrong one. `newSession()` shares the context but
  * cannot accept extensions. The classic SparkSession constructor takes
  * the extensions directly; it is Scala-private but public at the
  * bytecode level, so plain `getConstructor` reflection reaches it with
  * no accessibility override.
  *
  * The sibling shares the parent's SparkContext and SharedState
  * (catalog, cache manager) and builds a fresh SessionState whose
  * parser/optimizer include the injected extensions — exactly what
  * `newSession()` would do if it accepted extensions.
  */
object SiblingSession {
  def withExtensions(parent: SparkSession,
                     configure: SparkSessionExtensions => Unit): SparkSession = {
    val p = parent.asInstanceOf[classic.SparkSession]
    val ext = new SparkSessionExtensions
    configure(ext)
    val ctor = classOf[classic.SparkSession].getConstructor(
      classOf[SparkContext], classOf[Option[_]], classOf[Option[_]],
      classOf[SparkSessionExtensions], classOf[Map[_, _]], classOf[Map[_, _]])
    ctor.newInstance(p.sparkContext, Some(p.sharedState), None, ext,
      Map.empty[String, String], Map.empty[String, String])
  }
}
