"""Batched string-similarity kernels (Arrow/pandas UDFs — no per-row Python
in the Spark hot path).

The reference computes Jaro-Winkler per pair with ``jellyfish``
(``src/blocking/generate.py:72,90``, ``src/matching/logistic_regression.py:71-74``).
``jellyfish`` is row-at-a-time C over Python loops; here the whole batch is
vectorized in numpy over fixed-width UCS4 character matrices, invoked from
Spark as ``pandas_udf`` so each Arrow batch (~20k pairs) is one kernel call.

Semantics match ``jellyfish.jaro_winkler_similarity``:
  * match window = max(max(len1, len2) // 2 - 1, 0)
  * greedy left-to-right matching, transpositions = mismatches/2
  * Winkler boost only when jaro > 0.7, prefix capped at 4, scale 0.1
  * either side empty -> 0.0
Golden values are asserted in tests/test_similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from record_linkage_spark.config import (
    AFFINE_GAP_EXTEND,
    AFFINE_GAP_OPEN,
    AFFINE_MAX_LEN,
    AFFINE_MISMATCH,
    JW_MAX_LEN,
)

__all__ = [
    "jaro_winkler_np",
    "monge_elkan_np",
    "monge_elkan_pairs",
    "jaro_winkler_pairs",
    "token_jaccard_np",
    "jw_sim",
    "levenshtein_sim",
    "token_jaccard",
]


def _char_matrix(values: np.ndarray, max_len: int) -> np.ndarray:
    """object array of str -> (n, max_len) uint32 codepoint matrix, 0-padded.

    numpy 'U' storage is UCS4, so a view as uint32 gives codepoints with no
    per-row Python work; strings longer than max_len are truncated.
    """
    arr = np.asarray(values, dtype=f"U{max_len}")
    n = arr.shape[0]
    if n == 0:
        return np.zeros((0, max_len), dtype=np.uint32)
    return np.ascontiguousarray(arr).view(np.uint32).reshape(n, max_len)


def jaro_winkler_np(
    s1, s2, max_len: int = JW_MAX_LEN, winklerize: bool = True
) -> np.ndarray:
    """Vectorized Jaro-Winkler over two equal-length string sequences.

    None/NaN are treated as empty strings (similarity 0 unless both sides
    match per the empty rule). Returns float64 in [0, 1].

    Two batch-level reductions before the O(L²) matrix work — both exact,
    not approximations:
      * unique-pair collapse: blocking emits the same (a, b) string pair
        many times (every record pair inside a block shares a handful of
        distinct texts), so compute each distinct pair once and scatter;
      * equal-string fast path: within-entity duplicates usually carry
        byte-identical normalized text -> JW 1.0 with no matrix at all.
    """
    a = pd.Series(s1).fillna("").to_numpy(dtype=object)
    b = pd.Series(s2).fillna("").to_numpy(dtype=object)
    n = a.shape[0]
    if n == 0:
        return np.zeros(0)

    # length-prefixed key: unambiguous regardless of string contents;
    # hash-based factorize (no sort) — cheap even when every pair is
    # distinct and the reduction is a no-op
    keyed = np.empty(n, dtype=object)
    keyed[:] = [f"{len(x)}:{x}{y}" for x, y in zip(a, b)]
    inv, _ = pd.factorize(keyed)
    _, idx = np.unique(inv, return_index=True)
    au, bu = a[idx], b[idx]
    m = au.shape[0]
    res = np.zeros(m)
    eq = au == bu
    if eq.any():
        lens = np.fromiter((len(x) for x in au), count=m, dtype=np.int64)
        res[eq & (lens > 0)] = 1.0
    ne = ~eq
    if ne.any():
        res[ne] = _jw_matrix(au[ne], bu[ne], max_len, winklerize)
    return res[inv]


_JW_CHUNK = 2048


def _jw_matrix(a: np.ndarray, b: np.ndarray, max_len: int, winklerize: bool) -> np.ndarray:
    """Chunked dense JW: the O(rows·L²) match tensor for a full 20k Arrow
    batch is ~46MB — 32 concurrent workers saturate DRAM bandwidth and
    per-core throughput collapses ~10x. Chunks of 2k rows (~5MB tensor)
    stay cache-resident."""
    n = a.shape[0]
    if n > _JW_CHUNK:
        return np.concatenate(
            [
                _jw_matrix_chunk(a[i : i + _JW_CHUNK], b[i : i + _JW_CHUNK], max_len, winklerize)
                for i in range(0, n, _JW_CHUNK)
            ]
        )
    return _jw_matrix_chunk(a, b, max_len, winklerize)


def _jw_matrix_chunk(a: np.ndarray, b: np.ndarray, max_len: int, winklerize: bool) -> np.ndarray:
    """The dense character-matrix JW for distinct, unequal string pairs."""
    # trim the matrix width to the batch's longest string — the matrix and
    # greedy-match loop both scale ~L², so short-string batches (prefix
    # keys etc.) get proportionally cheaper
    eff_len = 1
    for x in a:
        if len(x) > eff_len:
            eff_len = len(x)
    for x in b:
        if len(x) > eff_len:
            eff_len = len(x)
    max_len = min(max_len, eff_len)

    A = _char_matrix(a, max_len)
    B = _char_matrix(b, max_len)
    n = A.shape[0]

    len1 = (A != 0).sum(1)
    len2 = (B != 0).sum(1)
    nonempty = (len1 > 0) & (len2 > 0)

    search = np.maximum(np.maximum(len1, len2) // 2 - 1, 0)
    idx = np.arange(max_len)
    # eq[r, i, j]: A[r,i] == B[r,j], both non-pad, |i-j| within window
    eq = (A[:, :, None] == B[:, None, :]) & (A[:, :, None] != 0)
    eq &= np.abs(idx[:, None] - idx[None, :])[None, :, :] <= search[:, None, None]

    a_flag = np.zeros((n, max_len), dtype=bool)
    b_flag = np.zeros((n, max_len), dtype=bool)
    max_l1 = int(len1.max()) if n else 0
    for i in range(max_l1):
        cand = eq[:, i, :] & ~b_flag
        has = cand.any(1)
        j_star = cand.argmax(1)
        rows = np.nonzero(has)[0]
        b_flag[rows, j_star[rows]] = True
        a_flag[rows, i] = True

    m = a_flag.sum(1).astype(np.float64)

    # compact matched chars of each side in positional order, compare
    a_pos = np.cumsum(a_flag, axis=1) - 1
    b_pos = np.cumsum(b_flag, axis=1) - 1
    a_comp = np.zeros((n, max_len), dtype=np.uint32)
    b_comp = np.zeros((n, max_len), dtype=np.uint32)
    ra, ca = np.nonzero(a_flag)
    a_comp[ra, a_pos[ra, ca]] = A[ra, ca]
    rb, cb = np.nonzero(b_flag)
    b_comp[rb, b_pos[rb, cb]] = B[rb, cb]
    # jellyfish/cjellyfish halve the mismatch count with *integer* division
    # (jaro.c: trans_count /= 2 on an int); DuckDB agrees — keep parity.
    trans = (((a_comp != b_comp) & (a_comp != 0)).sum(1) // 2).astype(np.float64)

    safe_m = np.maximum(m, 1.0)
    safe_l1 = np.maximum(len1, 1)
    safe_l2 = np.maximum(len2, 1)
    jaro = (m / safe_l1 + m / safe_l2 + (m - trans) / safe_m) / 3.0
    jaro = np.where((m > 0) & nonempty, jaro, 0.0)

    if winklerize:
        k = min(4, max_len)
        pref_eq = (A[:, :k] == B[:, :k]) & (A[:, :k] != 0)
        prefix = np.cumprod(pref_eq, axis=1).sum(1)
        boost = jaro > 0.7
        jaro = np.where(boost, jaro + prefix * 0.1 * (1.0 - jaro), jaro)

    return np.clip(jaro, 0.0, 1.0)


def token_jaccard_np(a_tokens, b_tokens) -> np.ndarray:
    """|A ∩ B| / |A ∪ B| over two sequences of token lists (None -> 0)."""
    out = np.zeros(len(a_tokens))
    for i, (ta, tb) in enumerate(zip(a_tokens, b_tokens)):
        if ta is None or tb is None:
            continue
        sa, sb = set(ta), set(tb)
        union = len(sa | sb)
        if union:
            out[i] = len(sa & sb) / union
    return out


def monge_elkan_np(
    s1, s2, max_len: int = JW_MAX_LEN
) -> tuple[np.ndarray, np.ndarray]:
    """Batched Monge-Elkan hybrid similarity (Monge & Elkan 1996) with
    Jaro-Winkler as the inner metric:

        ME(A→B) = mean over tokens a of A of  max over tokens b of B
                  of JW(a, b)

    Returns (me_ab, me_ba); the symmetric form is max of the two.
    Token-level typos and word reorderings score high where whole-string
    JW collapses ("acme corp intl" vs "intl acme corporation").

    Batch shape: tokens split per row (whitespace), the FULL batch's
    token cross-products flatten into ONE :func:`jaro_winkler_np` call
    (unique-pair collapse and the equal fast path apply across rows —
    repeated vocabulary costs one matrix each), then per-row
    max/mean segment reductions. Either side tokenless -> 0.0 both ways.
    """
    a = pd.Series(s1).fillna("").astype(str).to_numpy(dtype=object)
    b = pd.Series(s2).fillna("").astype(str).to_numpy(dtype=object)
    n = a.shape[0]
    me_ab = np.zeros(n)
    me_ba = np.zeros(n)
    if n == 0:
        return me_ab, me_ba
    ta = [x.split() for x in a]
    tb = [x.split() for x in b]
    fa: list[str] = []
    fb: list[str] = []
    for t_a, t_b in zip(ta, tb):
        if not t_a or not t_b:
            continue
        for x in t_a:
            fa.extend([x] * len(t_b))
            fb.extend(t_b)
    if not fa:
        return me_ab, me_ba
    sims = jaro_winkler_np(fa, fb, max_len)
    off = 0
    for i, (t_a, t_b) in enumerate(zip(ta, tb)):
        na, nb = len(t_a), len(t_b)
        if na == 0 or nb == 0:
            continue
        block = sims[off : off + na * nb].reshape(na, nb)
        off += na * nb
        me_ab[i] = block.max(axis=1).mean()
        me_ba[i] = block.max(axis=0).mean()
    return me_ab, me_ba


# --- Spark-facing pandas UDFs ---------------------------------------------

@F.pandas_udf(T.DoubleType())
def jaro_winkler_pairs(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(jaro_winkler_np(a, b))


@F.pandas_udf(
    T.StructType(
        [
            T.StructField("me_ab", T.DoubleType()),
            T.StructField("me_ba", T.DoubleType()),
        ]
    )
)
def monge_elkan_pairs(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """Both Monge-Elkan directions in one kernel pass; symmetric form =
    greatest(me_ab, me_ba) on the Spark side."""
    me_ab, me_ba = monge_elkan_np(a, b)
    return pd.DataFrame({"me_ab": me_ab, "me_ba": me_ba})


def soft_tfidf_np(
    ta, va, tb, vb, theta: float = 0.9, max_len: int = JW_MAX_LEN
) -> tuple[np.ndarray, np.ndarray]:
    """Batched SoftTFIDF (Cohen, Ravikumar & Fienberg 2003, IIWeb —
    their best name-matching metric): TF-IDF cosine where tokens need
    not match exactly — each token of A pairs with its best-JW token of
    B, and tokens whose best match clears ``theta`` (strict >) contribute
    ``v(a) * v(b_best) * jw``:

        ST(A→B) = Σ_{a ∈ A, max_b jw(a,b) > θ}  v_A(a) · v_B(b*) · jw(a, b*)

    Inputs are per-row token lists (SORTED ascending — argmax tiebreak is
    first-max, i.e. smallest token) and their L2-normalized TF-IDF
    weights. Returns (st_ab, st_ba); identical strings score 1.0.

    Batch shape mirrors :func:`monge_elkan_np`: the whole batch's token
    cross-products flatten into ONE :func:`jaro_winkler_np` call
    (unique-pair collapse + equal fast path apply across rows), then
    per-row argmax reductions. Either side empty/null -> 0.0 both ways.
    """
    n = len(ta)
    st_ab = np.zeros(n)
    st_ba = np.zeros(n)
    if n == 0:
        return st_ab, st_ba
    rows = []
    fa: list[str] = []
    fb: list[str] = []
    for i in range(n):
        A = list(ta[i]) if ta[i] is not None else []
        B = list(tb[i]) if tb[i] is not None else []
        rows.append((A, B))
        if A and B:
            for x in A:
                fa.extend([x] * len(B))
                fb.extend(B)
    if not fa:
        return st_ab, st_ba
    sims = jaro_winkler_np(fa, fb, max_len)
    off = 0
    for i, (A, B) in enumerate(rows):
        la, lb = len(A), len(B)
        if la and lb:
            m = sims[off : off + la * lb].reshape(la, lb)
            off += la * lb
            wa = np.asarray(va[i], dtype=float)
            wb = np.asarray(vb[i], dtype=float)
            jb = m.argmax(axis=1)  # first max == smallest token (sorted)
            best = m[np.arange(la), jb]
            mask = best > theta
            st_ab[i] = float(np.sum(wa[mask] * wb[jb[mask]] * best[mask]))
            ja = m.argmax(axis=0)
            bestb = m[ja, np.arange(lb)]
            maskb = bestb > theta
            st_ba[i] = float(np.sum(wb[maskb] * wa[ja[maskb]] * bestb[maskb]))
    return st_ab, st_ba


def soft_tfidf_udf(ta, va, tb, vb, theta: float = 0.9):
    """Column expression: both SoftTFIDF directions in one kernel pass
    over (tokens_A, weights_A, tokens_B, weights_B) array columns;
    returns struct(st_ab, st_ba). Symmetric form = greatest of the two
    on the Spark side."""

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("st_ab", T.DoubleType()),
                T.StructField("st_ba", T.DoubleType()),
            ]
        )
    )
    def _kernel(a: pd.Series, w1: pd.Series, b: pd.Series, w2: pd.Series) -> pd.DataFrame:
        ab, ba = soft_tfidf_np(
            a.to_numpy(dtype=object),
            w1.to_numpy(dtype=object),
            b.to_numpy(dtype=object),
            w2.to_numpy(dtype=object),
            theta,
        )
        return pd.DataFrame({"st_ab": ab, "st_ba": ba})

    cols = [F.col(c) if isinstance(c, str) else c for c in (ta, va, tb, vb)]
    return _kernel(*cols)


def jw_sim(a, b):
    """Column expression: batched Jaro-Winkler similarity of two string cols."""
    return jaro_winkler_pairs(F.col(a) if isinstance(a, str) else a,
                              F.col(b) if isinstance(b, str) else b)


def levenshtein_sim(a, b):
    """Normalized Levenshtein similarity 1 - dist/max(len) — pure Catalyst
    built-ins (JVM codegen), no Python. Null or both-empty -> 0.0 to match
    the kernel's null convention."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(
        a.isNull() | b.isNull() | (denom == 0), F.lit(0.0)
    ).otherwise(1.0 - F.levenshtein(a, b) / denom.cast("double"))


def token_jaccard(a, b):
    """Token-set Jaccard via array built-ins (array_intersect/array_union).

    Inputs are array<string> columns; null or empty-union -> 0.0.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(
        a.isNull() | b.isNull() | (union <= 0), F.lit(0.0)
    ).otherwise(inter / union.cast("double"))


def token_jaccard_sets(a, b):
    """Jaccard over PRE-DEDUPLICATED token arrays (profiles carry
    ``token_set`` = array_distinct once per record): one array_intersect
    per pair, union size by inclusion-exclusion |A|+|B|-|A∩B| — no
    per-pair union set build. Identical result to :func:`token_jaccard`
    on distinct inputs."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(
        a.isNull() | b.isNull() | (union <= 0), F.lit(0.0)
    ).otherwise(inter / union.cast("double"))


# --- M4: affine-gap similarity (Gotoh) ------------------------------------

def affine_gap_np(
    s1,
    s2,
    max_len: int = AFFINE_MAX_LEN,
    mismatch: float = AFFINE_MISMATCH,
    gap_open: float = AFFINE_GAP_OPEN,
    gap_extend: float = AFFINE_GAP_EXTEND,
) -> np.ndarray:
    """Vectorized affine-gap (Gotoh) similarity in [0, 1] over two string
    sequences — the M4 "Dedupe-style" string comparator (the reference's
    dedupe library scores String fields with a normalized affine-gap
    distance, ``src/matching/dedupe.py:155-168``; the vendor lib itself is
    out of scope, so this is an independent Gotoh implementation).

    sim = 1 - D / D_worst, where D is the minimal alignment cost with
    match 0 / mismatch / affine gaps, and D_worst = 2*gap_open +
    (len1+len2)*gap_extend (delete everything, insert everything). Equal
    non-empty strings -> 1.0; either side empty/None -> 0.0. Strings are
    truncated at ``max_len`` (documented cap, like JW_MAX_LEN).

    Vectorization: one Python loop over the ≤``max_len`` rows of the DP;
    each row is O(L) numpy ops across the whole batch. The within-row gap
    recurrence Y[j] = min_k<j (M[k] + open + (j-k)*extend) is computed as
    a running ``np.minimum.accumulate`` of M[k] + open - k*extend plus
    j*extend — no inner column loop. Unique-pair collapse and the
    equal-string fast path mirror :func:`jaro_winkler_np`.
    """
    a = pd.Series(s1).fillna("").to_numpy(dtype=object)
    b = pd.Series(s2).fillna("").to_numpy(dtype=object)
    n = a.shape[0]
    if n == 0:
        return np.zeros(0)

    keyed = np.empty(n, dtype=object)
    keyed[:] = [f"{len(x)}:{x}{y}" for x, y in zip(a, b)]
    inv, _ = pd.factorize(keyed)
    _, idx = np.unique(inv, return_index=True)
    au, bu = a[idx], b[idx]
    m = au.shape[0]
    res = np.zeros(m)
    eq = au == bu
    if eq.any():
        lens = np.fromiter((len(x) for x in au), count=m, dtype=np.int64)
        res[eq & (lens > 0)] = 1.0
    ne = ~eq
    if ne.any():
        res[ne] = _affine_chunked(
            au[ne], bu[ne], max_len, mismatch, gap_open, gap_extend
        )
    return res[inv]


def _affine_chunked(a, b, max_len, mismatch, gap_open, gap_extend):
    n = a.shape[0]
    if n > _JW_CHUNK:
        return np.concatenate(
            [
                _affine_chunk(
                    a[i : i + _JW_CHUNK], b[i : i + _JW_CHUNK],
                    max_len, mismatch, gap_open, gap_extend,
                )
                for i in range(0, n, _JW_CHUNK)
            ]
        )
    return _affine_chunk(a, b, max_len, mismatch, gap_open, gap_extend)


def _affine_chunk(a, b, max_len, mismatch, gap_open, gap_extend):
    """Batched Gotoh DP for distinct, unequal string pairs.

    Cost model: match 0, substitution ``mismatch``, a gap of length g costs
    ``gap_open + g * gap_extend``. Answer read at (len1, len2) per row;
    states past a row's true lengths involve padding but can never feed
    back into earlier columns, so they are left unmasked.
    """
    eff = 1
    for x in a:
        if len(x) > eff:
            eff = len(x)
    for x in b:
        if len(x) > eff:
            eff = len(x)
    L = min(max_len, eff)

    A = _char_matrix(a, L)
    B = _char_matrix(b, L)
    n = A.shape[0]
    len1 = (A != 0).sum(1)
    len2 = (B != 0).sum(1)

    INF = 1e18
    cols = np.arange(L + 1, dtype=np.float64)
    # row i=0: M only valid at j=0; Y[0][j] = open + j*extend (insert B[:j])
    M = np.full((n, L + 1), INF)
    X = np.full((n, L + 1), INF)
    Y = np.full((n, L + 1), INF)
    M[:, 0] = 0.0
    Y[:, 1:] = gap_open + cols[1:] * gap_extend

    final = np.full(n, INF)
    rows = np.arange(n)
    done = len1 == 0
    if done.any():
        best = np.minimum(M, np.minimum(X, Y))
        final[done] = best[done, len2[done]]

    for i in range(1, L + 1):
        prev = np.minimum(M, np.minimum(X, Y))
        # X: A[i-1] aligned to a gap — extends down rows, vectorized over j
        X_new = np.minimum(
            np.minimum(M, Y) + gap_open + gap_extend, X + gap_extend
        )
        # M: diagonal substitution step
        sub = np.where(A[:, i - 1][:, None] == B[:, :L], 0.0, mismatch)
        M_new = np.full((n, L + 1), INF)
        M_new[:, 1:] = prev[:, :-1] + sub
        # Y: within-row gap — prefix-min scan instead of a column loop:
        # Y[j] = min_{k<j} (min(M,X)[k] + open + (j-k)*extend)
        t = np.minimum(M_new, X_new) + gap_open - cols * gap_extend
        t_min = np.minimum.accumulate(t, axis=1)
        Y_new = np.full((n, L + 1), INF)
        Y_new[:, 1:] = t_min[:, :-1] + cols[1:] * gap_extend
        M, X, Y = M_new, X_new, Y_new

        done = len1 == i
        if done.any():
            best = np.minimum(M, np.minimum(X, Y))
            final[done] = best[done, len2[done]]

    worst = 2.0 * gap_open + (len1 + len2) * gap_extend
    sim = 1.0 - final / np.maximum(worst, 1e-9)
    sim = np.where((len1 == 0) | (len2 == 0), 0.0, sim)
    return np.clip(sim, 0.0, 1.0)


@F.pandas_udf(T.DoubleType())
def affine_gap_pairs(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(affine_gap_np(a, b))


def affine_sim(a, b):
    """Column expression: batched affine-gap (Gotoh) similarity."""
    return affine_gap_pairs(F.col(a) if isinstance(a, str) else a,
                            F.col(b) if isinstance(b, str) else b)
