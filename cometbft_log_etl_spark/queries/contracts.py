"""Data-model contracts the catalog depends on, pinned in ONE place.

The id-uniqueness contract: `documents.doc_id` and `embeddings.vec_id`
are row identities. The id-keyed similarity family treats them as such
(per-row join-backs, pair keys, cluster labels); when a corpus carries
DUPLICATE id rows, Spark's per-row plans keep both copies where the
oracles' GROUP BY collapses them — a row can even pair against its own
duplicate. The engine's posture is VALIDATE, don't silently repair:
deduping ids inside every similarity query at 100 TB would hide
upstream corruption behind an extra corpus-wide shuffle per query.
q12_quality_audit's `documents_docid_unique` / `embeddings_vecid_unique`
checks are the machine-checked gate that runs BEFORE the family.

ID_UNIQUENESS_CONTRACT_FAMILY is the exact set of catalog queries whose
Spark/oracle outputs are allowed to diverge on a duplicate-id corpus.
tests/test_duplicate_id_contract.py probes the WHOLE catalog against an
engineered duplicate-id corpus every CI run and asserts the divergence
set equals this list exactly — a new query that silently joins the
family (or a member that silently leaves it, changing semantics) fails
the suite instead of waiting for the round-end probe (round-9 verdict
item #6).

Membership history: 10 founding members adjudicated in round 8
(COVERAGE.md "Round-8 duplicate-id probe"), q46_substring_scrub joined
in round 9 and q66_selfrep_scrub in round 10 — both per-document
scrub outputs that keep one row per duplicate input row where the
oracle's final GROUP BY doc_id collapses them —
q114_incremental_clusters and q116_incremental_canonical in round 12
(both the q37 class exactly: their member frames keep one row per
duplicate corpus row where the oracles' recursive-reach GROUP BY
doc_id collapses them — q116's member counts shift by the duplicate
multiplicity; cluster labels and canonical ids themselves are
unaffected, ids are min-folded and the winner rule ties on doc_id). q45/q47/q102 provably
do NOT diverge (strict doc_a < doc_b never pairs equal ids; the q47
oracle builds per-row list_distinct precisely so duplicate batch ids
can't collapse on one side only). q132_duplicated_scrub joined in
round 13 — the q46/q103 class exactly: a per-document scrub whose
Spark side keeps one row per duplicate input row while the oracle's
final GROUP BY doc_id collapses them (and double-counts the kept
positions). q119 does NOT diverge (its Spark plan and oracle run the
identical per-position computation — duplicate rows double the gram
counts on BOTH sides symmetrically), nor do
q121/q122 (word-level; the only doc_id grouping is the same final
aggregate on both sides). q120_incremental_semdedup joined in round 13
with the q17/q25 rationale it inherits through the shared k-means
front: the oracle's position-exploded `elems` CTE carries BOTH copies
of a duplicated vec_id — per-(vec,pos) sums double, norms scale by
sqrt(2), cosines and assignments shift — while Spark's per-row arrays
see each row independently (since the round-14 in-row argmax
optimization the assignment keeps one row per input COPY rather than
merging copies with a groupBy; either way the family divergence the
contract asserts remains — probed: CI asserts it every run).
q133_semantic_drift joined in round 13 for the identical reason (same
assignment front; its report aggregates the shifted cosines).
q134_semantic_refit joined in round 14 — it runs TWO copies of that
same assignment front (stored model + full refit), so it inherits the
q120/q133 divergence class on both sides of its diff.
q07_ann_multiprobe joined in round 14 with the q101/q17/q25 rationale:
since the in-row bucket restatement, probes and candidates keep one
bucket row per duplicate input COPY while the oracle's GROUP BY
vec_id merges the copies' exploded positions into one doubled sum
(shifting bucket codes and the capped candidate ranking). Duplicate
ids remain an upstream data-contract violation caught by q12's audit,
not repaired here.
"""

from __future__ import annotations

ID_UNIQUENESS_CONTRACT_FAMILY: frozenset[str] = frozenset(
    {
        "q04_cosine_topk",
        "q06_embedding_neardup",
        "q07_ann_multiprobe",
        "q10_canonical_corpus",
        "q17_semantic_kmeans",
        "q25_semantic_dedup",
        "q37_neardup_clusters",
        "q39_ann_ivf",
        "q46_substring_scrub",
        "q55_minhash_lsh",
        "q85_ngram_jaccard",
        "q86_ann_lsh",
        "q76_multimodal_features",
        "q66_selfrep_scrub",
        "q114_incremental_clusters",
        "q116_incremental_canonical",
        "q120_incremental_semdedup",
        "q133_semantic_drift",
        "q134_semantic_refit",
        "q132_duplicated_scrub",
    }
)
