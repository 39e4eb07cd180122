package graft

import org.apache.spark.sql.functions._
import graft.plans.CartesianGuard

class CartesianGuardSpec extends SparkSpec {
  import spark.implicits._

  private def withGuard[A](body: => A): A = {
    CartesianGuard.enable(spark)
    try body
    finally spark.conf.set("spark.graft.guard.cartesian", "false")
  }

  test("guard blocks a condition-less inner join at planning time") {
    val a = (1 to 10).toDF("x")
    val b = (1 to 10).toDF("y")
    withGuard {
      val e = intercept[Exception] { a.join(b).collect() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("cartesian product blocked")), e.toString)
    }
  }

  test("guard permits explicit crossJoin and keyed joins") {
    val a = (1 to 5).toDF("x")
    val b = (1 to 5).toDF("y")
    withGuard {
      assert(a.crossJoin(b).count() == 25)
      assert(a.join(b, col("x") === col("y")).count() == 5)
    }
  }

  test("guard off by default: the same join plans normally") {
    val a = (1 to 3).toDF("x")
    val b = (1 to 3).toDF("y")
    // enable() ran in earlier tests, so the rule is installed in the
    // shared session — only the conf gates it now
    assert(spark.conf.get("spark.graft.guard.cartesian", "false") == "false")
    assert(a.join(b).count() == 9)
  }

  test("library queries survive the guard: broadcast 1-row stat crossJoins stay legal") {
    withGuard {
      // q66's broadcast-total plan uses an internal crossJoin
      assert(SparkEntry.queries("q66_bigram_pmi")(spark, sf001).count() > 0)
    }
  }
}
