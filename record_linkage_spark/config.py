"""Engine-wide constants.

Mirrors the *semantics* of the reference's ``src/config.py`` (thresholds,
seed discipline) re-targeted at the conversation-transcript payload.
Reference citations: ``src/config.py:61-64`` (RANDOM_SEED=42, JW
thresholds 0.95/0.85), ``logistic_regression.py:84-87`` (gaussian
comparator offsets/scales), ``ground_truth.py:234-249`` (block-size caps).
"""

from __future__ import annotations

# --- determinism -----------------------------------------------------------
# Every pseudo-random decision in this engine is a hash of stable row keys,
# never rand()/monotonically_increasing_id, so results are bit-identical
# across parallelism levels (required for the N-vs-4N scaling benchmark).
RANDOM_SEED = 42

# --- text normalization ----------------------------------------------------
# per reference mediated_schema.py:80-125
NULL_TOKENS = ("nan", "none", "null", "<na>", "n/a", "")

# --- blocking (cascade thresholds, reference src/config.py:63-64) ----------
JW_BLOCK_THRESHOLD_PRIMARY = 0.95   # B1: JW(manufacturer) analogue
JW_BLOCK_THRESHOLD_SECONDARY = 0.85  # B2: JW(model) analogue
BLOCK_PREFIX_LEN = 3                # manufacturer[:3] analogue (generate.py:53-54)
BLOCK_TOKEN_PREFIX_K = 3            # first-k normalized tokens as block key

# skew control: full pair enumeration only below this block size; above it
# the block is capped by deterministic hash-ranked sampling
# (reference ground_truth.py:234-249: full if <=50 else min(3n, 500))
MAX_FULL_BLOCK = 50
BLOCK_PAIR_CAP_FACTOR = 3
BLOCK_PAIR_CAP_ABS = 500
# hot-key salting: blocks with more rows than this get salted into
# ceil(n/SALT_TARGET_BLOCK) sub-blocks for the self-join
SALT_TARGET_BLOCK = 1000

# --- comparison-vector / classifier ---------------------------------------
# JW feature binarization thresholds (logistic_regression.py:71-74)
JW_FEATURE_THRESHOLD_HIGH = 0.85
JW_FEATURE_THRESHOLD_LOW = 0.70
# gaussian numeric comparator (offset, scale) per feature
# (logistic_regression.py:84-87); ours are transcript analogues
GAUSS_N_TURNS = (0.0, 2.0)          # turn-count difference
GAUSS_DURATION = (5.0, 60.0)        # conversation duration seconds
GAUSS_TOKENS = (2.0, 20.0)          # token-count difference
# threshold sweep grid (logistic_regression.py:34)
THRESHOLD_GRID_START = 0.10
THRESHOLD_GRID_STOP = 0.95
THRESHOLD_GRID_STEP = 0.05

# --- ground truth ----------------------------------------------------------
# stratified negatives: 70% hard (same full block key) / 30% medium
# (looser key) per ground_truth.py:210-279
NEG_HARD_FRACTION = 0.70
NEG_TO_POS_RATIO = 3.0
# 70/10/20 split (ground_truth.py:389-401), hash-bucketed
SPLIT_TRAIN_PCT = 70
SPLIT_VAL_PCT = 10

# --- similarity kernel -----------------------------------------------------
# strings fed to the batched Jaro-Winkler kernel are truncated to this many
# chars (blocking keys / token prefixes are short by construction)
JW_MAX_LEN = 48

# --- clustering ------------------------------------------------------------
CC_MAX_ITERATIONS = 25

# --- M4 dedupe-style affine-gap comparator (src/matching/dedupe.py) -------
AFFINE_MAX_LEN = 48                 # cap like JW_MAX_LEN; text beyond is truncated
AFFINE_MISMATCH = 5.0               # substitution cost (match = 0)
AFFINE_GAP_OPEN = 5.0               # gap-open cost (Gotoh)
AFFINE_GAP_EXTEND = 1.0             # gap-extend cost
