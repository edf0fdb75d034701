package graft.ml

/** Driver-side iteration scaffolding — the Spark counterpart of Flink's
  * bulk iteration (reference I1–I3: kmeans/KMeansOriginal.java:108-143,
  * damds/CG.java:74-153, damds/DAMDS.java:154-253). Catalyst has no
  * iterate node; the idiomatic translation is a driver loop whose
  * per-step state is small (centroids, CG scalars) while the big data
  * stays cached on the cluster. Callers are responsible for
  * persist/unpersist of any DataFrame they re-reference across steps.
  */
object Iterate {

  final case class Result[S](state: S, iters: Int, converged: Boolean)

  /** Fixed-count loop with optional early exit (I1/I2).
    *
    * @param converged called with (previous, next); true stops the loop
    */
  def loop[S](init: S, maxIter: Int)(step: S => S)(
      converged: (S, S) => Boolean = (_: S, _: S) => false): Result[S] = {
    var state = init
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val next = step(state)
      done = converged(state, next)
      state = next
      i += 1
    }
    Result(state, i, done)
  }
}
