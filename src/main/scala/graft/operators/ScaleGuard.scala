package graft.operators

/** Raised BY NAME when an uncapped quadratic operator measures its own
  * candidate-pair volume past the caller's budget at construction time
  * (round-15 verdict item 1). The sf0.1→sf1 load test proved the two
  * guarded forms are the operators a user can point at a big corpus
  * and melt — `Matching.score(maxBlockSize = None)` blocks on
  * fixed-cardinality keys (exponent 1.63 over the decade, 245.6 s at
  * sf1 vs ≤18.1 s capped), and `Dedup.minhashLshPairs(maxBucketSize =
  * None)` grows super-linearly on boilerplate vocabularies (exponent
  * 1.23) — while the capped paths are oracle-gated (q95/q101/q103)
  * and measured at exponent ≤0.57. The guard converts the silent melt
  * into an error that names the measured volume and the dial; the
  * message always carries the cap parameter to pass and the budget
  * override for callers who genuinely want the exact quadratic run.
  *
  * Deliberately an ERROR, not an auto-engaged cap: a cap is a RECALL
  * trade (sub-blocked pairs are dropped), and silently changing the
  * answer because the input grew would be worse than failing loudly —
  * the same contract torn parquet files get (TornFileException). */
final class ScaleGuardException(message: String)
  extends RuntimeException(message)
