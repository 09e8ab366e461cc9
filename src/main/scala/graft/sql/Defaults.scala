package graft.sql

/** Shared fixed constants for the native expression family — kept in the
  * sql layer so both the SQL function registry ([[GraftExtensions]]) and
  * the Column-API operators (`graft.operators.Dedup`) cite one source.
  * Fixed literals on purpose: SQL oracles restate them verbatim.
  */
object Defaults {

  /** Modulus of the portable hash family (prime, < 2^30 so products fit a
    * long) — the ONE definition every expression and oracle restates. */
  final val P = 1000000007L

  /** MinHash affine-permutation constants (a_i·h + b_i mod 1e9+7), k=24.
    * See `Dedup` for the k/bands/rows tuning rationale. */
  val MinhashA: Seq[Long] = Seq(
    919393L, 524287L, 786433L, 196613L, 393241L, 576259L, 106501L, 786437L,
    100003L, 200003L, 300007L, 400009L, 500009L, 600011L, 700001L, 800011L,
    900001L, 150001L, 250007L, 350003L, 450001L, 550007L, 650011L, 750019L)

  val MinhashB: Seq[Long] = Seq(
    273389L, 938113L, 654321L, 111119L, 222229L, 333331L, 444443L, 555557L,
    666671L, 777781L, 888887L, 999983L, 123457L, 234533L, 345547L, 456569L,
    567629L, 678649L, 789679L, 890701L, 901427L, 135463L, 246527L, 357643L)
}
