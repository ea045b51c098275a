/** Root package utilities. */
package object graft {

  /** Explicitly discard a non-Unit value. The build compiles with
    * `-Wnonunit-statement -Werror` (a discarded Column expression
    * silently dropped a denominator term once — the r14 q299
    * regression), so every intentional side-effecting call whose
    * result is unused (DDL `spark.sql`, warm-up actions, cache
    * `ensure`s) must say so at the call site.
    */
  @inline def discard[A](a: A): Unit = { val _ = a }
}
