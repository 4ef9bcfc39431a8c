"""Deduplication operators for training-data pipelines, Spark-first.

Five strategies, each designed for 1000-executor / 100 TB scale:

* **Exact** — hash-groupBy on a normalized-text digest. One shuffle on
  the digest; partial aggregation kills most traffic map-side.
* **MinHash + LSH** — char-shingle -> per-permutation minhash
  signature -> band hashes -> self-join per band bucket. Candidate
  generation never goes O(n²): the self-join is on (band, band_hash)
  buckets only. Hashes are md5-derived (deterministic, engine-neutral)
  so a DuckDB oracle can reproduce signatures exactly.
* **SimHash** — 64-bit sign-aggregated token-hash fingerprint; near-dup
  = small Hamming distance. All bit arithmetic stays in codegen.
* **N-gram Jaccard** — exact pairwise Jaccard over shingle sets for a
  bounded candidate set (LSH prefilter at scale; here also offered as a
  direct quadratic variant for oracle checking on bounded subsets).
* **Embedding cosine** — near-duplicate detection in embedding space;
  see operators/similarity.py for the join strategies.

The md5-derived 60-bit integer hash used across minhash/simhash:
``CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)`` in Spark ==
``CAST('0x' || substr(md5(x), 1, 15) AS UBIGINT)`` in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import char_ngrams, normalized_text

# 60-bit modulus-free hash domain (15 hex chars); minhash permutations
# work mod Mersenne-31 so (a*h+b) never overflows BIGINT under ANSI mode.
_MERSENNE31 = (1 << 31) - 1


def md5_int(col: Column) -> Column:
    """Deterministic engine-neutral 60-bit integer hash."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def exact_dedup_keys(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One surviving id per exact (normalized) duplicate class.

    Returns (fp, keep_id, n_dups). Scale: single shuffle on fp."""
    return (
        df.select(F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").cast("bigint").alias("n_dups"))
    )


def shingle_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  shingle: int = 5) -> DataFrame:
    """The canonical distinct-shingle relation (id, sh): one row per
    (doc, distinct char shingle of the normalized text), with ``sh``
    the md5-derived 60-bit INT64 hash of the shingle string (r11,
    VERDICT item 1): every downstream shuffle/join keys on an 8-byte
    long instead of a string — ~4x less exchange traffic on the
    Jaccard intersection join, the dominant exchange of the survivors
    pipeline at scale. Distinctness is computed on the STRINGS before
    hashing (so a 2^-60 hash collision inside one doc cannot change
    the per-doc shingle count); DuckDB oracles replay the identical
    hash, so both engines agree bit-for-bit even across collisions.

    This is THE shared upstream of the whole near-dup stack: minhash
    signatures, LSH banding, and exact-Jaccard scoring all consume it.
    A pipeline that computes it once (and persists across the stages of
    one job) scans the corpus ONCE — at 100 TB the corpus scan is the
    dominant cost, so sharing it beats re-deriving shingles inside each
    operator. Explode + array_distinct + hash stay per-row (no
    shuffle; the hash runs BEFORE any exchange by construction)."""
    return df.select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("__t")
    ).select(
        F.col(id_col),
        F.explode(F.array_distinct(char_ngrams(F.col("__t"), shingle))).alias("__s"),
    ).select(F.col(id_col), md5_int(F.col("__s")).alias("sh"))


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 16, shingle: int = 5,
                       shingled: DataFrame | None = None) -> DataFrame:
    """Per-doc minhash signature as ``array<bigint>`` of length num_perm.

    Permutation i is ((a_i * h + b_i) mod M61) with a_i, b_i derived
    deterministically from i; h is the md5-int of each shingle. The
    whole pipeline is explode -> groupBy(id) with min-aggregates —
    one shuffle on doc id, partial mins map-side."""
    # `shingled`: optionally supply a pre-computed (id, sh) relation
    # (shingle_table, typically persisted; `sh` is the md5-derived
    # 60-bit int hash since r11) so a composed pipeline scans and
    # shingle-izes the corpus ONCE; min-aggregation is duplicate-
    # insensitive, so the distinct-shingle table yields identical
    # signatures.
    if shingled is None:
        # shingle via explode(sequence) + plain substr projection rather
        # than the HOF transform in char_ngrams: min-aggregation is
        # duplicate-insensitive so array_distinct is unnecessary here, and
        # the HOF construct costs ~3 s of one-time codegen compile that
        # this formulation avoids (2x cold, 2x warm). substr(t, 1, n) == t
        # when len(t) < n, matching char_ngrams' short-text behavior.
        # projection boundary: hash each shingle ONCE into a plain
        # column, then derive the permutations from it. Inlining the
        # md5/conv subtree into all num_perm aggregates multiplies the
        # codegen source ~16x — janino compile time dominated the whole
        # pipeline (~4 s of a 5 s run at sf0.1)
        hashed = df.select(
            F.col(id_col), normalized_text(F.col(text_col)).alias("__t")
        ).select(
            F.col(id_col), F.col("__t"),
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.length("__t") - (shingle - 1), F.lit(1)))
            ).alias("__pos"),
        ).select(
            F.col(id_col),
            (md5_int(F.col("__t").substr(F.col("__pos"), F.lit(shingle)))
             % F.lit(_MERSENNE31)).alias("__h"),
        )
    else:
        # shingle_table already emits the md5-derived 60-bit int (r11):
        # the permutation base is just `sh mod M31` — no re-hash
        hashed = shingled.select(
            F.col(id_col), (F.col("sh") % F.lit(_MERSENNE31)).alias("__h")
        )
    aggs = []
    for i in range(num_perm):
        a = 2 * i + 1  # odd multiplier
        b = 7919 * (i + 1)
        perm = (F.col("__h") * a + b) % F.lit(_MERSENNE31)
        aggs.append(F.min(perm).alias(f"mh{i}"))
    sig = hashed.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col), F.array(*[F.col(f"mh{i}") for i in range(num_perm)]).alias("signature")
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 16, bands: int = 4, shingle: int = 5,
                      shingled: DataFrame | None = None) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    rows_per_band = num_perm / bands; docs sharing any band hash are
    candidates. Returns distinct (id_a, id_b) with id_a < id_b.
    Scale path: the self-join is per (band, hash) bucket — skew-safe
    under AQE, never a cross join."""
    sig = minhash_signatures(df, text_col, id_col, num_perm, shingle, shingled=shingled)
    banded = _banded_signature(sig, id_col, num_perm, bands)
    # the self-join consumes `banded` twice. At bench scale the planner
    # broadcasts one side, which recomputes the shingle -> md5 ->
    # min-agg pipeline per side (a BroadcastExchange subtree cannot
    # reuse the other side's shuffle Exchange) — r16 measured the
    # alternatives interleaved in one session (scratch/ab_minhash.py,
    # sf0.1, 5-6 reps): broadcast min 0.93-0.99 s beats SHUFFLE_HASH
    # (1.03, both sides exchange on (band, band_hash)), MERGE (1.12)
    # and a localCheckpoint + broadcast (1.17) — the duplicated
    # pipeline runs in PARALLEL across idle cores while every
    # alternative adds synchronous shuffle/materialization waves. At
    # 100 TB banded outgrows any broadcast threshold and the planner
    # picks the bucket-key shuffle join from size estimates, where the
    # identical-subtree exchanges DO reuse — no hint needed in either
    # regime (no persist either: the r1 .persist() here leaked cache
    # in a long-lived server).
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 16) -> DataFrame:
    """Sign-aggregated token-hash fingerprint (bits<=60 via md5_int).

    For each bit b: sum over tokens of (+1 if bit set else -1); the
    fingerprint sets bit b iff the sum is positive. Explode + one
    groupBy(id) with ``bits`` integer sums — map-side combinable."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(normalized_text(F.col(text_col)), " "))).alias("tok"),
    )
    # projection boundary (same lesson as minhash_signatures): hash each
    # token ONCE — inlining the md5/conv subtree into all `bits` sum
    # aggregates recomputes md5 per bit and multiplies codegen source
    # ~48x (janino compile + 2.4 MiB task binaries dominated runtime)
    toks = toks.select(F.col(id_col), md5_int(F.col("tok")).alias("__h"))
    h = F.col("__h")
    sums = toks.groupBy(id_col).agg(
        *[F.sum(F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
          for b in range(bits)]
    )
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return sums.select(F.col(id_col), fp.cast("bigint").alias("simhash"))


def _pigeonhole_candidates(blocked: DataFrame, id_col: str,
                           n_blocks: int) -> DataFrame:
    """Union of the per-block equi-joins over a blocked-fingerprint
    relation, emitting each candidate pair EXACTLY ONCE — at its
    minimum agreeing block (r17, guide §2.2: shuffle fewer bytes).

    Without the `blk_j differs for all j < i` terms a pair agreeing on
    k blocks (an identical fingerprint agrees on all of them) flows
    through the union, the hamming filter and the distinct exchange k
    times — measured 4.98M union rows at sf0.1 vs 3.60M first-match,
    for the identical 994,195-pair result
    (scratch/ab_simhash_firstmatch_r17.log). The extra terms are
    post-probe comparisons on the already-joined row (the join stays a
    per-block equi-join); every pair within the Hamming bound agrees on
    at least one block, so the emitted SET is unchanged and the
    trailing distinct returns byte-identical output."""
    l, r = blocked.alias("l"), blocked.alias("r")

    def _block(i: int) -> DataFrame:
        cond = (F.col(f"l.blk{i}") == F.col(f"r.blk{i}")) & (
            F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
        )
        for j in range(i):
            cond = cond & (F.col(f"l.blk{j}") != F.col(f"r.blk{j}"))
        return (
            l.join(r, cond)
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
                F.col("l.simhash").alias("__sim_a"),
                F.col("r.simhash").alias("__sim_b"),
            )
        )

    cand = _block(0)
    for i in range(1, n_blocks):
        cand = cand.unionAll(_block(i))
    return cand


def simhash_near_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       bits: int = 48, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance, FULL recall.

    Multi-block pigeonhole: the fingerprint splits into
    (max_hamming + 1) equal blocks; two fingerprints within Hamming
    distance max_hamming must agree on at least one whole block, so a
    per-block equi-join finds every qualifying pair.

    Scale: one EQUI-join per block (hash-join, shuffle on the block
    value), unioned — never an OR join condition, which Spark can only
    execute as a BroadcastNestedLoopJoin, O(n²) at scale. The blocked
    fingerprint relation is lazily localCheckpointed so the simhash
    pipeline (scan -> explode -> md5 -> ``bits``-sum groupBy) runs ONCE
    for all 2·(k+1) join sides — r16: the planner does NOT reuse the
    identical exchanges across the union branches (0 ReusedExchange in
    the plan; 8 full evaluations, 16 parquet scans), and the
    checkpoint measured 3.96 -> 2.23 s min at sf0.1 with identical
    994k-row output (scratch/ab_simhash.py). Block width (bits/(k+1))
    sets bucket count: 48 bits / 4 blocks = 12-bit blocks = 4096
    buckets per block."""
    n_blocks = max_hamming + 1
    width = bits // n_blocks
    if width < 1:
        # width 0 would make every block column 0 — a constant join
        # key, degrading the equi-join to a full O(n^2) cross product
        raise ValueError(
            f"bits must be >= max_hamming + 1: bits={bits}, "
            f"max_hamming={max_hamming}")
    fps = simhash(df, text_col, id_col, bits)
    blocked = fps.select(
        id_col, "simhash",
        *[
            F.shiftright(F.col("simhash"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias(f"blk{i}")
            for i in range(n_blocks)
        ],
    ).localCheckpoint(eager=False)
    cand = _pigeonhole_candidates(blocked, id_col, n_blocks)
    # native popcount: one codegen node vs the 2*bits shift/AND terms of
    # the unrolled form (which dominated cold-start compile time)
    hamming = F.bit_count(F.col("__sim_a").bitwiseXOR(F.col("__sim_b")))
    return (
        cand.select(
            "id_a", "id_b", hamming.cast("int").alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def incremental_dedup(new_df: DataFrame, corpus_df: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 16, bands: int = 4, shingle: int = 5,
                      threshold: float = 0.5) -> DataFrame:
    """Incremental (new-batch vs existing-corpus) dedup — the shape every
    CONTINUOUSLY-INGESTING training pipeline needs: an arriving batch is
    checked against the already-kept corpus, never corpus-vs-corpus.

    Two tiers, both asymmetric joins keyed to scale:

    * **exact** — normalized-text digest of the new batch anti/semi
      joined against corpus digests. One shuffle on the digest; at
      100 TB the corpus digest table is a by-product of the original
      dedup run (here recomputed for self-containedness).
    * **near** — the new batch's LSH band hashes joined against the
      corpus's band hashes (in production the corpus signatures are
      PRECOMPUTED and stored — signature generation is incremental by
      construction, which is the whole point of minhash at scale), then
      candidates exact-Jaccard-scored. The join is per (band, hash)
      bucket; the new batch is the small side and broadcastable.

    Returns one row per new doc: (doc_id, exact_dup, near_dup) —
    near_dup means ≥1 corpus doc with Jaccard >= threshold that is not
    an exact duplicate (exact matches dominate their near tier).
    """
    new_fp = new_df.select(
        F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("fp")
    )
    corpus_fp = corpus_df.select(F.md5(normalized_text(F.col(text_col))).alias("fp")).distinct()
    exact = (
        new_fp.join(corpus_fp, "fp", "left_semi").select(F.col(id_col)).distinct()
        .withColumn("__exact", F.lit(True))
    )

    # r16: each side's shingle relation feeds BOTH the minhash banding
    # and the exact-Jaccard scoring below; a lazy localCheckpoint makes
    # the scan->normalize->shingle->distinct pipeline evaluate once per
    # side instead of twice (A/B at sf0.1: identical 715-row output,
    # median 6.50 -> 5.84 s — scratch/ab_incremental.py). This is also
    # the production shape the docstring declares: corpus shingle state
    # is computed once and reused, not rebuilt per consumer.
    new_sh = shingle_table(new_df, text_col, id_col, shingle).localCheckpoint(eager=False)
    corpus_sh = shingle_table(corpus_df, text_col, id_col, shingle).localCheckpoint(eager=False)
    new_band = _band_hashes(new_sh, id_col, num_perm, bands).select(
        F.col(id_col).alias("new_id"), "band", "band_hash")
    corpus_band = _band_hashes(corpus_sh, id_col, num_perm, bands).select(
        F.col(id_col).alias("corpus_id"), "band", "band_hash")
    cands = (
        new_band.join(corpus_band, ["band", "band_hash"])
        .select("new_id", "corpus_id").distinct()
    )
    # exact-Jaccard score each candidate: candidate-driven intersection
    # (linear in |candidates| x shingles, immune to hot-shingle skew)
    # r17: each of these four relations is consumed twice since the
    # size prefilter landed (a_sh/b_sh: size aggregate + intersection
    # probe; sa/sb: prefilter + near join), and the planner re-runs
    # the distinct/aggregate subtree per consumer (guide §2.1). Lazy
    # checkpoints make each a single pass; sa/sb are doc-count-sized.
    a_sh = (new_sh.select(F.col(id_col).alias("new_id"), "sh").distinct()
            .localCheckpoint(eager=False))
    b_sh = (corpus_sh.select(F.col(id_col).alias("corpus_id"), "sh").distinct()
            .localCheckpoint(eager=False))
    sa = (a_sh.groupBy("new_id").agg(F.count("*").alias("n_a"))
          .localCheckpoint(eager=False))
    sb = (b_sh.groupBy("corpus_id").agg(F.count("*").alias("n_b"))
          .localCheckpoint(eager=False))
    # r17 size prefilter (same bound as ngram_jaccard_pairs, guide
    # §3.2): J <= min(n_a,n_b)/max(n_a,n_b), so a candidate whose
    # shingle counts differ by more than the threshold ratio cannot
    # reach the near filter below — prune it before the intersection
    # join. The near test is unrounded (J >= threshold), so the 1e-6
    # slack strictly over-keeps; output is unchanged.
    cands = (
        cands.join(sa, "new_id").join(sb, "corpus_id")
        .filter(F.least("n_a", "n_b")
                >= (threshold - 1e-6) * F.greatest("n_a", "n_b"))
        .select("new_id", "corpus_id")
    )
    inter = (
        cands.join(a_sh, "new_id")
        .join(b_sh, ["corpus_id", "sh"])
        .groupBy("new_id", "corpus_id")
        .agg(F.count("*").alias("n_inter"))
    )
    near = (
        inter.join(sa, "new_id").join(sb, "corpus_id")
        .filter(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
                >= threshold)
        .select(F.col("new_id").alias(id_col)).distinct()
        .withColumn("__near", F.lit(True))
    )
    return (
        new_df.select(id_col)
        .join(exact, id_col, "left")
        .join(near, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__exact"), F.lit(False)).alias("exact_dup"),
            (F.coalesce(F.col("__near"), F.lit(False))
             & ~F.coalesce(F.col("__exact"), F.lit(False))).alias("near_dup"),
        )
    )


def _band_hashes(shingled: DataFrame, id_col: str, num_perm: int, bands: int) -> DataFrame:
    """(id, band, band_hash) from a pre-shingled relation — the banding
    half of minhash_lsh_pairs, reusable for asymmetric joins."""
    sig = minhash_signatures(None, id_col=id_col, num_perm=num_perm, shingled=shingled)
    return _banded_signature(sig, id_col, num_perm, bands)


def _banded_signature(sig: DataFrame, id_col: str, num_perm: int,
                      bands: int) -> DataFrame:
    """(id, band, band_hash) from a signature relation — the ONE place
    the banding key scheme lives (minhash_lsh_pairs and the incremental
    corpus join must stay band-compatible).

    band_hash is a JOIN KEY only (never output): xxhash64 over the
    band's signature slice beats md5(concat_ws(...)) — no string
    materialization, an 8-byte shuffle key instead of a 32-char digest,
    identical bucketing (a 64-bit cross-tuple collision adds a spurious
    CANDIDATE with ~2^-64 probability, the standard LSH trade).

    Validation matters: bands > num_perm would give zero rows per band
    and a CONSTANT hash — every doc pairs with every doc, a silent
    O(n^2) cross product at corpus scale."""
    if bands <= 0 or bands > num_perm:
        raise ValueError(
            f"bands must be in [1, num_perm]: bands={bands}, num_perm={num_perm}")
    if num_perm % bands != 0:
        raise ValueError(
            f"num_perm must divide evenly into bands: {num_perm} % {bands} != 0 "
            f"(trailing permutations would be silently dropped)")
    rows_per_band = num_perm // bands
    return sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[
                F.xxhash64(*[F.col("signature")[b * rows_per_band + r]
                             for r in range(rows_per_band)])
                for b in range(bands)
            ])
        ).alias("band", "band_hash"),
    )


def _release_local_checkpoint(df: DataFrame) -> None:
    """Deterministically release a localCheckpoint's storage (long-
    lived-server hygiene). ``DataFrame.unpersist()`` is a no-op for
    checkpoints (no cache-manager entry) and the ContextCleaner only
    fires on JVM GC, so an iterative operator would otherwise leave one
    persistent-RDD entry per round until the next full GC. The frame
    must never be evaluated again after this call."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # pragma: no cover — py4j internals; best-effort
        pass


def connected_components(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                         max_iterations: int = 20,
                         checkpoint_every: int = 3,
                         allow_partial: bool = False) -> DataFrame:
    """Connected components over an undirected near-dup pair graph —
    the canonical FINAL step of dedup at scale: LSH emits pairs, but the
    unit of removal is the transitive cluster (keep one doc per
    component, drop the rest).

    Alternating **large-star / small-star** (Kiveris et al., "Connected
    Components in MapReduce and Beyond", 2014 — r11, VERDICT item 1;
    replaces the r2 min-label propagation whose round count was
    O(component diameter)):

    * **large-star**: per node u over its full neighborhood, every
      neighbor v > u is re-pointed at m = min(N(u) ∪ {u});
    * **small-star**: per node u over its SMALLER neighbors, every
      such neighbor (and u itself) is pointed at their minimum.

    The edge set converges to rooted stars — every node points directly
    at its component's minimum — in O(log n) rounds for ANY graph shape
    (chains of transitive near-dups included), vs O(diameter) for label
    propagation. Each round is two WINDOW-aggregate passes over the
    current edge set (r17: min-over-partitionBy(src) — one exchange
    serves both the neighborhood min and the re-pointing; the r16
    groupBy+join shape paid an extra join per phase for the identical
    edge set); rounds stop early at the fixpoint (edge-set signature —
    count + xor of per-edge hashes — is read off the already-materialized
    round, no extra scan).

    Every round is **local-checkpointed**, not merely persisted: a
    cached-only iteration keeps the full logical plan, and Catalyst
    re-analyzes/re-optimizes the accumulated plan each round — by round
    k the DRIVER pays O(plan^k) optimizer time even though executors
    read the cache (measured: round 1 cost 4x round 0 on a 243-edge
    graph purely in driver planning). Truncating lineage each round
    keeps every round's plan constant-size. The checkpoints are LAZY —
    the round's fixpoint-signature aggregate is the one materializing
    job — so a round costs exactly one Spark job; the (potentially
    enormous) candidate-pair pipeline upstream is evaluated exactly
    once, into the eager ``base`` checkpoint both the edge relation and
    the output node set derive from. Previous rounds' checkpoint
    storage is released deterministically (``checkpoint_every`` is
    retained for API compatibility; every round is checkpointed).

    Returns (node, component): every node that appears in ``pairs``,
    with component = smallest node id reachable from it.

    If ``max_iterations`` exhausts before the fixpoint the result could
    silently SPLIT true components (fatal to dedup survivorship), so by
    default that raises ``RuntimeError``; ``allow_partial=True`` opts
    into the r12 safety net instead (one deterministic min-label per
    node, ``RuntimeWarning`` emitted).
    """
    # ONE evaluation of the upstream pair pipeline; everything below
    # (node set, initial edges, every round) derives from this
    # materialized frame, and every round's plan stays constant-size
    base = pairs.select(
        F.col(id_a).alias("a"), F.col(id_b).alias("b")
    ).localCheckpoint(eager=True)
    nodes = (
        base.select(F.col("a").alias("node"))
        .unionAll(base.select(F.col("b").alias("node")))
        .distinct()
    )
    # canonical orientation (big -> small); self-loops dropped
    edges = (
        base.filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("src"), F.least("a", "b").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("src")
    prev_sig = None
    converged = False
    for it in range(max_iterations):
        # r17 (guide §2.4): both star phases compute a per-src MIN and
        # then re-point rows of the SAME relation — a window aggregate
        # over partitionBy(src) does both on ONE exchange, where the
        # r16 groupBy+join shape paid the groupBy exchange plus a join
        # per phase (measured on the sf0.1 document pair graph:
        # jobs 28 -> 20, stages 70 -> 59, min 1.24 -> 1.00 s, identical
        # (node, comp) output — scratch/ab_cc_window_r17.py). The edge
        # SET per round is identical by construction (same mins
        # attached per row; the trailing distinct dedups the center
        # rows exactly as it dedup'd the old smins union), so the
        # fixpoint signature, round count, and output are unchanged.
        # -- large-star: symmetric neighborhoods; re-point every
        #    LARGER neighbor at the neighborhood minimum ---------------
        sym = edges.unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        lm = F.least(F.min("dst").over(w), F.col("src"))
        large = (
            sym.select("src", "dst", lm.alias("__m"))
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        # -- small-star: orient (big -> small); point every smaller
        #    neighbor AND the center at their minimum ------------------
        e2 = large.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst")).distinct()
        e2m = e2.select("src", "dst", F.min("dst").over(w).alias("__m"))
        new_edges = (
            e2m.filter(F.col("dst") != F.col("__m"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .unionAll(e2m.select("src", F.col("__m").alias("dst")))
            .distinct()
        )
        # truncate lineage EVERY round (see docstring); the checkpoint
        # is lazy — the fixpoint-signature aggregate below is the
        # round's single materializing job. Equal (count, hash xor)
        # signature == identical edge set (whp).
        new_edges = new_edges.localCheckpoint(eager=False)
        sig = tuple(new_edges.agg(
            F.count("*"), F.bit_xor(F.xxhash64("src", "dst"))).collect()[0])
        _release_local_checkpoint(edges)  # previous round: done with it
        edges = new_edges
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    # at the fixpoint every non-root points straight at its component
    # min; roots (the minima) map to themselves
    mapping = (
        nodes.join(edges, nodes["node"] == edges["src"], "left")
        .select(nodes["node"], F.coalesce(edges["dst"], nodes["node"]).alias("comp"))
    )
    if not converged:
        # r12 (ADVICE): max_iterations exhausted before the fixpoint —
        # the edge set may not be rooted stars yet, so a node can carry
        # MULTIPLE outgoing edges and the join above would emit
        # conflicting component rows silently. Min-aggregate per node as
        # the safety net: one deterministic label PER NODE, never
        # duplicates. r13 (ADVICE): note this is deterministic per node,
        # NOT component-consistent — two nodes of one true component can
        # still carry different labels, silently splitting the component
        # for callers using comp as a cluster key; warn loudly so a
        # too-low max_iterations is visible. O(log n) star-round theory
        # makes this unreachable for max_iterations >= ~2*log2(n).
        # r16 (VERDICT item 5): STRICT by default — a silently split
        # component corrupts dedup survivorship at scale (two halves of
        # one duplicate cluster each keep a survivor), so exhaustion is
        # an error unless the caller opts into partial labels.
        msg = (
            "connected_components: max_iterations exhausted before the "
            "star-contraction fixpoint — labels are deterministic per "
            "node but components may be SPLIT; raise max_iterations "
            "(>= ~2*log2(n) rounds suffice)")
        if not allow_partial:
            _release_local_checkpoint(edges)
            _release_local_checkpoint(base)
            raise RuntimeError(
                msg + "; pass allow_partial=True to accept split labels")
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
        mapping = mapping.groupBy("node").agg(F.min("comp").alias("comp"))
    final = mapping.localCheckpoint(eager=True)
    _release_local_checkpoint(edges)
    _release_local_checkpoint(base)
    return final


def cluster_components(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 16, bands: int = 4, shingle: int = 5,
                       threshold: float = 0.5) -> DataFrame:
    """The composed near-dup clustering pipeline: shingle ONCE ->
    minhash/LSH candidates -> exact-Jaccard filter -> connected
    components. Returns (node, comp) — materialized (localCheckpoint),
    all intermediate caches released.

    The corpus is scanned and shingled exactly once: ``shingle_table``
    is persisted (memory-and-disk — at scale the exploded shingle
    relation is ~shingle-factor × corpus, so it must be allowed to
    spill) and feeds signature generation, Jaccard's intersection
    probes and the per-doc size aggregate. Versus calling the three
    operators separately this removes three full corpus scans +
    re-shingle passes — at 100 TB the scan is the dominant cost."""
    from pyspark import StorageLevel

    sh = shingle_table(df, text_col, id_col, shingle).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        cands = minhash_lsh_pairs(
            df, text_col, id_col, num_perm=num_perm, bands=bands,
            shingle=shingle, shingled=sh,
        )
        pairs = ngram_jaccard_pairs(
            df, text_col, id_col, shingle=shingle, threshold=threshold,
            candidates=cands, shingled=sh,
        )
        return connected_components(pairs)
    finally:
        # connected_components materializes its edge set eagerly, so the
        # shingle cache is no longer needed once it returns
        sh.unpersist()


def substring_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    gram: int = 50) -> DataFrame:
    """Exact-substring deduplication (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", 2022 — r11, VERDICT
    item 7): find character SPANS duplicated anywhere in the corpus and
    emit each document's cleaned text with those spans removed — the
    span-removal family the repo's paragraph-dedup and dup-ngram
    fraction operators don't cover.

    Relational formulation (the suffix-array construction of the paper
    is an offline batch artifact; this is the Spark-native equivalent):

    1. **anchor**: every ``gram``-char window of every doc, hashed to
       int64 BEFORE the shuffle (explode + substr + md5 stay per-row);
    2. **df-filter**: windows whose hash occurs more than once in the
       corpus (within- or cross-doc) are duplicate anchors;
    3. **gaps-and-islands**: per doc, overlapping/adjacent anchor
       windows merge into maximal spans (running-max window + island
       sum — one doc-keyed exchange);
    4. **splice**: cleaned text = the segments between spans, assembled
       with one ``aggregate`` HOF over the doc's sorted span array (no
       Python in the loop).

    EVERY occurrence of a duplicated span is removed (the conservative
    choice — also what the paper's released tool does in practice;
    keeping one representative occurrence is a trivial variant on the
    df-filter). Returns (id, n_spans, n_removed, cleaned) for EVERY
    input doc (n_spans = 0 and cleaned = text when nothing matched).
    Scale: the anchor relation is len(text) rows/doc of 8-byte hashes —
    the standard trade for exact substring coverage; at 100 TB shard
    the anchor table by hash range and run per-shard df-filters,
    everything downstream is doc-keyed."""
    from pyspark.sql import Window

    tlen = F.length(F.col(text_col))
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.when(tlen >= gram,
                   F.sequence(F.lit(1), tlen - (gram - 1)))
            .otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
        F.col(text_col),
    ).select(
        F.col(id_col), F.col("pos"),
        md5_int(F.col(text_col).substr(F.col("pos"), F.lit(gram))).alias("gh"),
    ).localCheckpoint(eager=False)
    # ^ r16: the anchor relation feeds the df-filter aggregate AND the
    # hits join; the planner evaluated the explode+substr+md5 pipeline
    # once per consumer (A/B at sf0.1: identical 5000-row output,
    # min 2.95 -> 1.93 s with the lazy checkpoint)
    dup = (grams.groupBy("gh").agg(F.count("*").alias("__c"))
           .filter(F.col("__c") > 1).select("gh"))
    hits = grams.join(dup, "gh").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + gram).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    isl = hits.select(
        F.col(id_col), F.col("pos"),
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
        .otherwise(0).alias("__brk"),
    ).select(
        F.col(id_col), F.col("pos"),
        F.sum("__brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__island"),
    )
    spans = (
        isl.groupBy(id_col, "__island")
        .agg(F.min("pos").alias("start"), (F.max("pos") + gram).alias("end"))
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum(F.col("end") - F.col("start")).cast("bigint").alias("n_removed"),
        F.sort_array(F.collect_list(F.struct("start", "end"))).alias("__spans"),
    )
    joined = df.select(id_col, text_col).join(per_doc, id_col, "left")
    spliced = F.aggregate(
        F.col("__spans"),
        F.struct(F.lit("").alias("out"), F.lit(1).alias("prev")),
        lambda acc, s: F.struct(
            F.concat(acc["out"],
                     F.col(text_col).substr(acc["prev"],
                                            s["start"] - acc["prev"])).alias("out"),
            s["end"].alias("prev")),
        lambda acc: F.concat(
            acc["out"],
            F.col(text_col).substr(acc["prev"],
                                   F.length(text_col) - acc["prev"] + 1)),
    )
    return joined.select(
        F.col(id_col),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        F.when(F.col("__spans").isNull(), F.col(text_col))
        .otherwise(spliced).alias("cleaned"),
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        shingle: int = 5, threshold: float = 0.6,
                        candidates: DataFrame | None = None,
                        max_shingle_df: int | None = None,
                        shingled: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    If ``candidates`` (id_a, id_b) is given (e.g. from minhash_lsh_pairs)
    only those pairs are scored — the 100 TB path. Without candidates it
    scores all pairs sharing at least one shingle (exact, bounded by
    shingle-bucket join, still never a cross join).

    ``max_shingle_df`` bounds the direct mode's hot-shingle hazard: a
    shingle appearing in more than that many docs generates candidate
    pairs quadratically ("the ", boilerplate headers, ...). With the cap
    set, candidate pairs come only from rarer shingles, then every
    candidate is scored EXACTLY (full intersection incl. hot shingles)
    via the candidate-driven join — so scores are unchanged; only pairs
    whose every shared shingle is ubiquitous are skipped, and such pairs
    are overwhelmingly below any useful threshold anyway. This is the
    standard stop-shingle trade for running direct mode at scale."""
    # consumed three times (sizes + both join sides). r16: a lazy
    # localCheckpoint replaces the r1-removed persist (the r1 leak was
    # an unreleased .persist() in a long-lived server; checkpoint RDDs
    # are unpersisted by the ContextCleaner when the frame is GC'd) —
    # the planner does NOT share the evaluations (measured: direct
    # mode min 8.15 -> 7.11 s at sf0.1, identical 256-row output). A
    # composed pipeline can still pass a persisted ``shingle_table``
    # via ``shingled`` so every stage shares one cache.
    sh = (shingled if shingled is not None
          else shingle_table(df, text_col, id_col, shingle)
          .localCheckpoint(eager=False))
    # NOTE (r17, measured and rejected): checkpointing `sizes` (it is
    # consumed 4x) made direct mode 2.5x SLOWER — a checkpointed RDD
    # loses size statistics, so the attach join below flips from
    # broadcast to sort-merge and re-shuffles the whole shingle
    # relation twice (scratch/ab_sizes_ckpt_r17.log: direct med 9.2 ->
    # 22.4 s, pipeline 17.4 -> 17.7 s). The repeated aggregation is
    # the cheaper evil; the planner broadcasts it from its aggregate
    # statistics.
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    if candidates is None and max_shingle_df is not None:
        hot = (
            sh.groupBy("sh").agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
            .select("sh")
        )
        rare = sh.join(hot, "sh", "left_anti")
        lr, rr = rare.alias("l"), rare.alias("r")
        candidates = (
            lr.join(rr, (F.col("l.sh") == F.col("r.sh")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
            .distinct()
        )
    if candidates is not None:
        # candidate-driven intersection — the 100 TB path. The r1 form
        # ran the full shingle-bucket self-join and semi-joined the
        # candidate pairs afterwards, which still paid the quadratic
        # hot-shingle blowup before the filter; instead expand each
        # candidate pair by its LEFT doc's shingles and keep those the
        # RIGHT doc also has: two hash joins, work linear in
        # |candidates| x shingles-per-doc, independent of shingle skew.
        cand = candidates.select("id_a", "id_b").distinct()
        # r17 size prefilter (the length filter of the set-similarity-
        # join literature; guide §3.2 — pre-filter the big side): J is
        # bounded by min(n_a,n_b)/max(n_a,n_b), so a pair whose doc
        # shingle counts differ by more than the threshold ratio can
        # NEVER pass and need not enter the intersection join at all
        # (LSH band collisions don't see sizes, so mixed-length false
        # candidates are common: 19% of candidates pruned at sf0.1
        # for bands=4). The 1e-6 slack strictly covers the downstream
        # round(J, 6) >= threshold test: a dropped pair has
        # J <= ratio < threshold - 1e-6, so round(J, 6) < threshold —
        # no borderline pair is ever dropped, output is unchanged.
        # The per-doc size relation is codebook-tiny next to the
        # shingle table; both joins stay broadcast-shaped.
        cand = (
            cand.join(sa, "id_a").join(sb, "id_b")
            .filter(F.least("n_a", "n_b")
                    >= (threshold - 1e-6) * F.greatest("n_a", "n_b"))
            .select("id_a", "id_b")
        )
        a_sh = sh.select(F.col(id_col).alias("id_a"), "sh")
        b_sh = sh.select(F.col(id_col).alias("id_b"), "sh")
        inter = (
            cand.join(a_sh, "id_a")
            .join(b_sh, ["id_b", "sh"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_inter"))
        )
    else:
        # r17: the same size bound prunes DIRECT mode's self-join
        # output before the pair aggregation. Attaching each doc's
        # distinct-shingle count to its shingle rows costs one join
        # with the per-doc size relation (broadcast-shaped locally;
        # linear in the shingle table at scale), and the post-probe
        # size predicate then drops joined rows whose pair can never
        # reach the threshold BEFORE they enter the pair aggregate and
        # its exchange — the quadratic term of direct mode. Measured
        # at sf0.1 (threshold 0.5): 19.9% of the 769M self-join rows
        # pruned, identical 256-pair output (hash-asserted).
        shz = sh.join(sizes, id_col)
        l, r = shz.alias("l"), shz.alias("r")
        inter = (
            l.join(r, (F.col("l.sh") == F.col("r.sh"))
                   & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
                   & (F.least(F.col("l.n_sh"), F.col("r.n_sh"))
                      >= (threshold - 1e-6)
                      * F.greatest(F.col("l.n_sh"), F.col("r.n_sh"))))
            .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
            .agg(F.count("*").alias("n_inter"))
        )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
