package graft.queries

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Overflow-headroom pins for every query whose integer algebra
  * carries a documented scale bound (VERDICT r8 #1's done criterion:
  * each bound either BANKED into DECIMAL(38,0)/HUGEINT or pinned by a
  * property that fails when the bound is violated).
  *
  * Two families of pins, all in BigInt so the arithmetic itself
  * cannot wrap while checking for wrapping:
  *
  *   1. BANKED sites (q217/q221/q229/q199/q195/q233/q215/q202/q131/
  *      q134/q186/q116): the wide terms must fit DECIMAL(38,0) at
  *      10¹⁰ rows — the bank has its own ceiling (10³⁸) and these
  *      pins fail if a rewrite pushes a term past it. A witness
  *      assertion per site shows the OLD BIGINT form genuinely
  *      overflowed below 10¹⁰ rows (why the bank exists).
  *   2. RESIDUAL BIGINT sites (q219, q221's wsum, q229/q199's
  *      ppm·chars sums, q202's exposed cents): the documented
  *      closed-form worst case must stay under 2⁶³ at 10¹⁰ rows.
  *
  * N = 10¹⁰ is the round's declared scale target ("no query's integer
  * arithmetic silently overflows below 10¹⁰ rows").
  */
class HeadroomSpec extends AnyFunSuite {

  private val N = BigInt(10).pow(10) // the 10¹⁰-row scale target
  private val LONG_MAX = BigInt(Long.MaxValue)
  private val DEC38 = BigInt(10).pow(38) // DECIMAL(38,0) ceiling

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("q217 Spearman: banked Σd² algebra fits DECIMAL(38,0) at 10^10 rows/nation") {
    // worst case: every rank displaced by n → Σd² ≤ n·n² = n³
    val sumD2 = N.pow(3)
    assert(6000000 * sumD2 < DEC38, "ppm numerator must fit the bank")
    assert(N * N * N - N < DEC38, "denominator n(n²−1) must fit the bank")
    // witness: the old BIGINT form wrapped barely past current scale
    // (documented trip at n ≈ 1.6e4 per nation)
    val nOld = BigInt(17000)
    assert(6000000 * (nOld.pow(3) - nOld) / 3 > LONG_MAX,
      "the unbanked ppm numerator had to wrap below 10^10 rows")
  }

  test("q221 Gini gain: banked squares fit the bank; residual wsum stays BIGINT-safe") {
    assert(1000000 * (N * N) < DEC38, "10⁶·n² must fit the bank")
    // residual: wsum = Σ_v n_v·G_ppm ≤ 10⁶·Σ_v n_v = 10⁶·n
    assert(1000000 * N < LONG_MAX, "wsum ≤ 10⁶·n must stay in BIGINT")
    assert(N * N > LONG_MAX, "the unbanked n² had to wrap below 10^10 rows")
  }

  test("q229/q199 CDF drift: banked cross-products fit; ppm·chars sums stay BIGINT-safe") {
    // banked: c·n ≤ n² and the ppm numerator 10⁶·n²
    assert(1000000 * N * N < DEC38)
    // residual: Σ (v_next − v)·gap_ppm telescopes to ≤ char_range·10⁶;
    // even a 1 GB max document length leaves 5000× headroom
    val charRange = BigInt(10).pow(9)
    assert(charRange * 1000000 < LONG_MAX)
    assert(N * N > LONG_MAX, "the unbanked c·n had to wrap below 10^10 rows")
  }

  test("q195 chi-square: banked squares fit; contrib quotient stays BIGINT-safe") {
    // banked: (1000·o − e₃)² ≤ (1000·n)²
    assert((1000 * N).pow(2) < DEC38)
    // residual: contrib ≤ dev²/e₃ ≤ 1225·n for any cell whose
    // marginals carry ≥ 1/35 of the mass (5 types × 7 dows)
    assert(1225 * N < LONG_MAX)
    assert((1000 * N).pow(2) > LONG_MAX,
      "the unbanked dev² had to wrap below 10^10 rows")
  }

  test("q233/q202 cents algebra: banked products fit; exposed cents stay BIGINT-safe") {
    // a 10¹⁰-row corpus at ≤ 10⁶ cents/event ($10k) — generous caps
    val totalCents = N * 1000000
    assert(1000 * totalCents * N < DEC38, "q233's 1000·cents_d·n_t bank")
    assert(N * totalCents < DEC38, "q202's N·Σcents bank")
    // q202's exposed s_cents = S′ div N is bounded by total cents
    assert(totalCents < LONG_MAX, "the exposed CUSUM cents must stay BIGINT")
    assert(N * totalCents > LONG_MAX,
      "the unbanked N·Σcents had to wrap below 10^10 rows")
  }

  test("q215 AUC: banked R2 fits the bank at 10^10 scored rows") {
    // R2 = Σ pos_g·(2c + n_g + 1) ≤ n·(3n + 1)
    val r2 = N * (3 * N + 1)
    assert(1000000 * r2 < DEC38)
    assert(2 * N * N < DEC38, "denominator 2·n_pos·n_neg must fit")
    assert(N * N > LONG_MAX, "the unbanked R2 had to wrap below 10^10 rows")
  }

  test("q131/q134/q186/q116 banked terms fit DECIMAL(38,0) at 10^10 rows") {
    assert(N * N < DEC38, "q131 freq·n_keys")
    assert((1000000 * N / 1000).pow(2) < DEC38, "q134 dev² (ppt-quantized)")
    val totalCents = N * 1000000
    assert(BigInt(1200) * 1200 * totalCents < DEC38,
      "q186 slope products at a 100-year month range")
    assert(N * N < DEC38, "q116 Σc² worst case (one token everywhere)")
  }

  test("q219 HITS: L∞-renormalized propagation stays BIGINT-safe to deg ~ 10^10") {
    // after every renormalize all scores ≤ 10⁴; a degree-deg node
    // accumulates ≤ deg·10⁴ (10¹⁴ at the target), and the renormalize
    // multiply ×10⁴ peaks at deg·10⁸ = 10¹⁸ < 2⁶³ — safe at 10¹⁰
    assert(N * 10000 < LONG_MAX, "accumulation stays safe at 10^10 degree")
    assert(N * 10000 * 10000 < LONG_MAX, "renormalize numerator too")
    // the bound genuinely trips just above the target (deg ≈ 9.2e10),
    // so this pin fails if anyone raises the fixed-point scale
    assert(BigInt(93) * BigInt(10).pow(9) * 10000 * 10000 > LONG_MAX)
  }

  test("banked integral division matches BigInt on adversarial magnitudes (both signs)") {
    // Spark DECIMAL(38,0) `div` and DuckDB HUGEINT `//` both truncate
    // toward zero — replay the q217/q186 quotients in BigInt across
    // random wide magnitudes and signs and pin truncation semantics
    // (BigInt / truncates toward zero, the same contract)
    val g = for {
      a <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      b <- Gen.choose(1L, Long.MaxValue / 4)
      neg <- Gen.oneOf(true, false)
    } yield (BigInt(a) * 3, if (neg) -BigInt(b) else BigInt(b))
    (1 to 200).foreach { i =>
      val (num, den) = sample(g, 0xbeefL + i)
      val q = num / den
      // |q·den| ≤ |num| and the remainder has the numerator's sign
      assert((q * den).abs <= num.abs)
      val r = num - q * den
      assert(r == 0 || r.signum == num.signum)
      assert(r.abs < den.abs)
    }
  }
}
