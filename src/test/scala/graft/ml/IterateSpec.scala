package graft.ml

import org.scalatest.funsuite.AnyFunSuite

class IterateSpec extends AnyFunSuite {

  test("fixed-count loop runs exactly maxIter steps") {
    val r = Iterate.loop(0, 7)(_ + 1)()
    assert(r.state == 7 && r.iters == 7 && !r.converged)
  }

  test("convergence predicate stops early") {
    val r = Iterate.loop(0.0, 100)(x => x / 2 + 1) { (a, b) =>
      math.abs(a - b) < 1e-12
    }
    assert(r.converged && r.iters < 100)
    assert(math.abs(r.state - 2.0) < 1e-9) // fixed point of x/2+1
  }

  test("zero iterations returns init") {
    val r = Iterate.loop("init", 0)(_ + "x")()
    assert(r.state == "init" && r.iters == 0)
  }
}
