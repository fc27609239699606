package graft

import org.apache.spark.sql.functions._

import graft.exts.exprs
import graft.operators.Similarity

/** Custom Catalyst expressions (graft.exts): fused-loop cosine/dot vs the
  * higher-order-function formulation, plus the null/mismatch edges. */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (2L, Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(2.0f, 2.0f, 2.0f), Seq(2.0f, 2.0f, 2.0f))
  ).toDF("id", "a", "b")

  test("cosine_sim matches the zip_with/aggregate formulation") {
    val rows = df.select(
      exprs.cosineSim(col("a"), col("b")).as("fused"),
      Similarity.dot(col("a"), col("b")).as("hof_dot"),
      exprs.dotProduct(col("a"), col("b")).as("fused_dot"),
      (Similarity.dot(col("a"), col("b")) /
        (Similarity.norm(col("a")) * Similarity.norm(col("b")))).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(3)) < 1e-12)
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12)
    }
  }

  test("edges: null array, length mismatch, null element, zero norm -> null") {
    val edge = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)), // length mismatch
      (2L, Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))        // zero norm
    ).toDF("id", "a", "b")
      .union(Seq((3L, null.asInstanceOf[Seq[Float]], Seq(1.0f, 2.0f))).toDF("id", "a", "b"))
    val out = edge.select(exprs.cosineSim(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("SQL registration via GraftExtensions function builder") {
    // register on the existing session the same way the extension does
    new graft.exts.GraftExtensions()
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.exts.CosineSimilarity(children(0), children(1)),
      "built-in")
    df.createOrReplaceTempView("vec_t")
    val v = spark.sql("SELECT cosine_sim(a, b) AS c FROM vec_t WHERE id = 3").head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("codegen and interpreted paths agree") {
    // interpreted: non-codegen context via eval on literal expressions
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val at = ArrayType(DoubleType, containsNull = true)
    def arr(xs: Double*) = Literal.create(ArrayData.toArrayData(xs.toArray), at)
    val e = graft.exts.CosineSimilarity(arr(1, 2, 3), arr(4, 5, 6))
    val interpreted = e.eval(null).asInstanceOf[Double]
    val viaPlan = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(exprs.cosineSim(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(interpreted - viaPlan) < 1e-15)
  }
}
