package graft.services

import java.sql.SQLException
import org.scalatest.funsuite.AnyFunSuite
import graft.snapshot.CatalogReader

/** Retry taxonomy around the SQL seam: transient SQLSTATEs back off and
  * retry, everything else fails fast — the reference's classifier
  * (`pq/snapshot/helpers.go:110-178`) as unit-testable policy.
  */
class RetryingExecutorSpec extends AnyFunSuite {
  import RetryingExecutor._

  private def flaky(failures: Int, state: String): (CatalogReader.SqlExecutor, () => Int) = {
    var calls = 0
    val exec: CatalogReader.SqlExecutor = { _ =>
      calls += 1
      if (calls <= failures) throw new SQLException(s"induced $state", state)
      Seq(Seq("ok"))
    }
    (exec, () => calls)
  }

  test("40001/55006/57P03 retry with backoff then succeed") {
    for (state <- Seq("40001", "55006", "57P03")) {
      val (exec, calls) = flaky(2, state)
      val slept = Seq.newBuilder[Long]
      val out = wrap(exec, Policy(maxAttempts = 5, initialBackoffMillis = 100),
        sleep = slept += _)(s"SELECT 1 /* $state */")
      assert(out == Seq(Seq("ok")))
      assert(calls() == 3, s"$state: 2 failures + 1 success")
      assert(slept.result() == Seq(100L, 200L), s"$state: exponential backoff")
    }
  }

  test("non-transient SQLSTATE fails fast on the first attempt") {
    val (exec, calls) = flaky(1, "42601") // syntax_error
    val ex = intercept[SQLException] {
      wrap(exec, Policy(maxAttempts = 5), sleep = _ => ())("SELEC typo")
    }
    assert(ex.getSQLState == "42601")
    assert(calls() == 1, "no retry for a syntax error")
  }

  test("exhausted attempts rethrow the last transient failure") {
    val (exec, calls) = flaky(100, "40P01")
    val ex = intercept[SQLException] {
      wrap(exec, Policy(maxAttempts = 3), sleep = _ => ())("SELECT 1")
    }
    assert(ex.getSQLState == "40P01")
    assert(calls() == 3)
  }

  test("class-08 connection failures and wrapped causes are transient") {
    assert(isTransient(new SQLException("conn dropped", "08006")))
    assert(isTransient(new RuntimeException("wrapper",
      new SQLException("deadlock", "40P01"))))
    assert(!isTransient(new SQLException("denied", "42501")))
    assert(!isTransient(new RuntimeException("no sql cause")))
    assert(!isTransient(new SQLException("stateless failure", null: String)))
  }

  test("backoff is capped at maxBackoffMillis") {
    val p = Policy(maxAttempts = 10, initialBackoffMillis = 100, maxBackoffMillis = 500)
    assert((1 to 6).map(p.backoffFor) == Seq(100L, 200L, 400L, 500L, 500L, 500L))
  }

  test("retried executor composes with a real service call") {
    // CatalogReader through a once-flaky executor: the service sees no error.
    var calls = 0
    val exec: CatalogReader.SqlExecutor = { sql =>
      calls += 1
      if (calls == 1) throw new SQLException("restarting", "57P03")
      if (sql.contains("COUNT(*)")) Seq(Seq("7")) else Seq.empty
    }
    val cat = new CatalogReader(wrap(exec, sleep = _ => ()))
    assert(cat.rowCount("public", "t") == 7L)
  }
}
