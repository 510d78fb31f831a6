package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

/** SQL registration + native-expression semantics/codegen checks. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions: dot_f32, cosine_f32, amount_category") {
    GraftFunctions.register(spark)
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f)), (Array(1f, 0f, 0f), Array(0f, 1f, 0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val dots = spark.sql("SELECT dot_f32(a, b) AS d, cosine_f32(a, a) AS self FROM vecs")
      .as[(Double, Double)].collect()
    assert(dots(0)._1 == 32.0 && dots(1)._1 == 0.0)
    assert(math.abs(dots(0)._2 - 1.0) < 1e-12)

    val cats = spark.sql(
      "SELECT amount_category(x) AS c FROM VALUES (49.99), (50.0), (199.99), (200.0) AS t(x)")
      .as[String].collect().toSeq
    assert(cats == Seq("Low", "Medium", "Medium", "High"))
  }

  test("native dot product matches the HOF formulation exactly") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet").limit(50).cache()
    val hof = e.select($"vec_id",
      aggregate(zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val native = e.select($"vec_id", graft.functions.VectorFns.dot($"embedding", $"embedding").as("d"))
    val joined = hof.as("h").join(native.as("n"), "vec_id")
      .select(($"h.d" === $"n.d").as("eq")).as[Boolean].collect()
    assert(joined.nonEmpty && joined.forall(identity))
  }

  test("native expressions stay inside whole-stage codegen") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val plan = e.select(graft.functions.VectorFns.cosine($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen span in the string plan; the
    // native expressions must sit inside one, not fall back
    assert(plan.contains("*(1) Project") && plan.contains("dot_f32"))
  }
}
