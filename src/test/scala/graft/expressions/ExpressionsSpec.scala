package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("host_of / origin_of codegen'd expressions match the pure functions") {
    val urls = Seq(
      "https://zh.wikipedia.org/wiki/X",
      "http://host3.graft.example/wiki/Category:K1?page=2",
      "https://a.b.c/x#frag")
    val df = urls.toDF("url")
      .select(col("url"),
        UrlExpressions.host_of(col("url")).as("h"),
        UrlExpressions.origin_of(col("url")).as("o"))
    df.collect().foreach { r =>
      assert(r.getString(1) == graft.functions.UrlFunctions.hostOf(r.getString(0)))
      assert(r.getString(2) == graft.functions.UrlFunctions.originOf(r.getString(0)))
    }
    // SQL surface
    assert(spark.sql("SELECT host_of('https://x.y/z')").head().getString(0) == "x.y")
  }

  test("float_dot equals the declarative zip_with/aggregate form bit-for-bit") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val declarative = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diff = df
      .select(VectorExpressions.float_dot(col("a"), col("b")).as("fast"),
        declarative.as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0)
  }

  test("float_lsh_bucket derives dims from the input array — 32/64/128-dim all bucket on every component") {
    val rnd = new scala.util.Random(7)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(p: Int, i: Int): Double = {
      md.reset()
      val d = md.digest(s"plane$p|$i".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
    }
    for (dims <- Seq(32, 64, 128)) {
      val rows = (1 to 20).map(i => (i.toLong, Array.fill(dims)(rnd.nextFloat() * 2 - 1)))
      val got = rows.toDF("id", "e")
        .select(col("id"), LshExpressions.float_lsh_bucket(col("e"), 8).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      rows.foreach { case (id, e) =>
        var exp = 0
        for (p <- 0 until 8) {
          var acc = 0.0
          var i = 0
          while (i < dims) { acc += e(i).toDouble * sign(p, i); i += 1 }
          if (acc > 0) exp |= 1 << p
        }
        assert(got(id) == exp, s"dims=$dims id=$id: bucket must cover all $dims components")
      }
    }
  }

  test("float_dot null handling") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f)))
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.float_dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
  }
}
