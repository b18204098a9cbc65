"""Pipeline configuration.

The reference resolves Hydra YAML into a DictConfig (bela/main.py:14-16);
here a plain frozen dataclass is the whole config surface — the "plan" is the
lazy DataFrame DAG itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class LinkageConfig:
    # --- normalization / shingling (T3/T4 analogues) ---
    shingle_k: int = 3          # tokens per shingle
    prefix_len: int = 2         # tokens in the prefix blocking key

    # --- MinHash-LSH blocking (J1 analogue of FAISS top-k bound) ---
    num_minhashes: int = 16
    band_size: int = 4          # 16/4 = 4 bands; pairs agreeing on >=1 band collide

    # --- candidate-pair generation (J3) ---
    salt_buckets: int = 8       # salted self-join grid for hot keys
    hot_key_threshold: int = 64      # ids per key above which salting kicks in
                                     # (C(64,2) ~ 2k pair-emits keeps cold join
                                     # tasks fine-grained — no output-skew
                                     # stragglers; bigger keys hit the S^2 grid)
    mega_key_threshold: int = 512    # ids per key above which quadratic pairing
                                     # stops: switch to sorted-neighborhood
                                     # chaining (linear pairs, CC closes the
                                     # transitive group) — logged, never silent
    chain_window: int = 4            # neighbors each record pairs with in a
                                     # chained mega key
    max_ids_per_key: int = 20_000    # hard cap used by the standalone cap_keys
                                     # operator (drops logged)

    # --- pairwise scoring (E5/E6/E8 analogues) ---
    lev_max_chars: int = 64     # bound the O(L^2) Levenshtein per pair; exact
                                # identity is already covered by the exact-
                                # collapse stage + jaccard, so a bounded prefix
                                # is the scale-safe feature
    embedding_dim: int = 64
    w_lev: float = 0.35
    w_jac: float = 0.35
    w_cos: float = 0.30
    score_threshold: float = 0.55    # calibrated on labeled fixtures with the
                                     # production scorer (lev64-prefix + hashed-
                                     # token jaccard): negatives max ~0.540,
                                     # positives min ~0.573 (tests/test_pipeline_f1.py)

    # --- connected components (C1-C6) ---
    max_cc_rounds: int = 25
    checkpoint_dir: str | None = None   # parquet round checkpoints when set

    # --- misc ---
    seed: int = 42
    extra: dict = field(default_factory=dict)
