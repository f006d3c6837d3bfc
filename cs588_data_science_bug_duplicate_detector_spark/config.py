"""Pinned pipeline configuration.

Mirrors the reference's pinned-config discipline
(``/root/reference/configs/config_training.json``: seed=42, fixed k values)
but for hash-based detectors instead of a learned encoder.
All hash seeds / permutations derive from ``seed`` — no wall-clock, no
process-dependent randomness, so every stage is deterministic and
resumable.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # --- shingling / MinHash (detector 1) ---
    shingle_k: int = 5          # tokens per shingle (k-shingles over extracted text)
    # 'token' (default): k-shingles over [a-z0-9]+ tokens — right for
    # space-separated scripts. 'char': k-CHARACTER sliding shingles over
    # whitespace-collapsed lowercased text — the standard MinHash unit for
    # CJK and other unsegmented scripts, where the ASCII tokenizer yields
    # zero tokens and token-mode (correctly) refuses to call anything a
    # duplicate. Char mode applies to the MinHash detector; whole-corpus
    # runs over mixed scripts should partition by script/lang and use
    # token mode for segmented languages (set per-partition config).
    shingle_mode: str = "token"
    num_perm: int = 128         # MinHash permutations (reference-equivalent signature width)
    bands: int = 32             # LSH bands
    rows_per_band: int = 4      # bands * rows_per_band == num_perm
    verify_threshold: float = 0.6   # estimated-Jaccard acceptance on candidate pairs
    # pairs colliding in >= this many bands are accepted without the
    # signature-join verify: P(J<0.6 | m>=8 of 32 bands) is negligible
    # (J=0.6 -> band-match p=0.13, mean 4.1; binomial tail above 8 vanishes),
    # and high-match pairs are exactly the quadratic bulk (exact dups, farms)
    auto_accept_bands: int = 8

    # --- SimHash (detector 2: near-identical pages) ---
    simhash_bits: int = 64
    simhash_chunks: int = 4         # pigeonhole chunks -> guarantees recall for hamming<=chunks-1
    simhash_hamming_max: int = 3
    simhash_chunk_cap: int = 128    # hot chunk buckets -> verified star edges (same trade as bucket_cap)

    # --- suffix / long-shared-span (detector 3) ---
    suffix_window: int = 50     # tokens per anchored window
    suffix_min_tokens: int = 50
    anchor_k: int = 8           # tokens per anchor gram (content-defined anchors)
    anchor_mod: int = 4         # ~1/anchor_mod of positions become anchors
    max_windows_per_doc: int = 512  # cap on anchored windows per doc (drop count surfaced in stage meta)
    # anchor-selection hash: 'xxhash64' (production, fastest JVM hash) or
    # 'md5' (portable — bit-identical in DuckDB, used by the oracle-checked
    # suffix query). Both modes are pytest-gated on planted long-span pairs.
    anchor_hash: str = "xxhash64"

    # --- skew handling ---
    # LSH buckets above this size take the linear star-edge path instead of
    # the quadratic pair join (a 200-member boilerplate bucket is 19,900
    # pairs x 32 bands otherwise). Star edges are verified like any pair, so
    # precision is unaffected; the documented trade is member<->member recall
    # inside a hot bucket when BOTH members fail the root verify.
    bucket_cap: int = 128
    # 0 = off. When > 1, hot buckets are ADDITIONALLY salted into this many
    # id-hashed sub-buckets whose intra-sub-bucket pairs are generated and
    # verified normally (north_rule "explicit salting of skewed LSH
    # buckets"): quadratic cost drops from c^2 to ~c^2/salt per hot bucket
    # while recovering member<->member recall that star-only capping trades
    # away when both members fail the root verify. Star edges still run, so
    # connectivity never regresses.
    bucket_salt: int = 0

    # --- retrieval metrics ---
    k_values: tuple = (1, 5, 10, 20)

    seed: int = 42

    def __post_init__(self):
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError("bands * rows_per_band must equal num_perm")

    def fingerprint(self) -> str:
        """Stable hash of the config — part of every stage checkpoint's
        lineage. Folds in the signature KERNEL_VERSION so persisted
        signatures (pipeline checkpoints, DedupIndex) from an older hash
        family are invalidated rather than silently mixed with newly
        signed data."""
        from .functions.hashing import KERNEL_VERSION

        payload = json.dumps(
            {**asdict(self), "_kernel_version": KERNEL_VERSION},
            sort_keys=True,
            default=str,
        )
        return hashlib.sha256(payload.encode("utf-8")).hexdigest()[:16]


DEFAULT_CONFIG = DedupConfig()
