"""Driver-side collect bound policy — ONE place (r17, VERDICT r16
item 9: the caps previously lived in five call sites with five
different values and no shared rationale, which is how the next
collect ships uncapped).

Policy: anything `.collect()`ed into driver memory on a query path
must fall into exactly one of these classes, each with a documented
bound and a documented over-bound behavior:

1. **Model artifacts** — size fixed by operator PARAMETERS, not by
   data volume (PQ/IVF-PQ codebooks: m*ksub rows; Lloyd round means:
   m*ksub*sub_d cells; k-per-round BPE merge winners: LIMIT 1).
   Bounded by construction; no runtime cap needed. Marked at the call
   site with a comment naming this class.
2. **Query/seed rows** — size fixed by the CALLER's argument list
   (ANN query vectors: |query_ids| rows; codebook seeds: ksub rows).
   Bounded by contract; the collect is `.isin(query_ids)`-pruned or
   LIMIT-ed so the driver can never receive more than the caller asked
   to look up.
3. **Data-dependent broadcasts** — size grows with the data and MUST
   carry an explicit row cap with a declared fallback:
   * ``EXACT_PAIRS_MAX_BROADCAST_ROWS`` (exact_cosine_pairs): past the
     cap the operator falls back to the relational theta-join form
     (bit-identical output, pytest-asserted).
   * ``LOOKUP_MAX_ROWS`` (corpus.rank_within_group): caps the
     numPartitions x ngroups prefix-offset lookup; past it the operator
     falls back to the hash-partitioned window (the scale-correct plan
     for many small groups).

The numeric values are unchanged from their r15/r16 call sites (this
module unifies the POLICY; re-deriving different numbers would change
which path borderline inputs take).
"""

# class-3 cap: exact_cosine_pairs vector table. 200k rows x 64-dim
# float64 = ~100 MB of driver state — the same bytes the pre-r16
# BroadcastNestedLoopJoin build side held. Fallback: relational join.
EXACT_PAIRS_MAX_BROADCAST_ROWS = 200_000

# class-3 cap: rank_within_group prefix-offset lookup rows
# (numPartitions x ngroups — the PRODUCT is what must stay bounded;
# ~1M rows is tens of MB). Fallback: hash-partitioned window.
LOOKUP_MAX_ROWS = 1_000_000
# floor on the width-aware group threshold derived from LOOKUP_MAX_ROWS
LOOKUP_MIN_GROUPS = 1024
