"""Tensor-plane scorer: the GLiREL architecture as a deterministic
numpy test double.

The reference scores entity pairs with (glirel/model.py:141-259):
  T1  label prompt construction        (model.py:150-178)
  T2+ token encoding                   (token_rep.py, transformer_embeddings.py)
  T7  label-embedding strategy 'both'  (model.py:205-214)
  T8  BiLSTM word re-encoder           (layers.py:9-30)
  T9  span rep markerv1: FFN(start) ⊕ FFN(end) -> relu -> FFN
                                       (rel_rep.py:12-37, span_rep.py:5-29)
  T11 pair rep: gather + concat + out_project (rel_rep.py:131-207)
  T12 prompt FFN over label reps       (model.py:75-80, 226)
  T13 dot scorer + sigmoid             (layers.py:146-194, model.py:383)

This container has no torch and no network, so the transformer encoder
is replaced by a deterministic embedding + window-mean context mixer;
every OTHER stage keeps the reference's exact dataflow shape (same
tensor shapes, same pair ordering contract as
generate_entity_pairs_indices / test_rel_rep.py). With real weights the
numpy ops are swapped for an ONNX session — the Spark plumbing
(model-per-executor singleton, label-rep caching, Arrow batching) is
the part this engine owns, and it is identical either way.
"""

from __future__ import annotations

import hashlib

import numpy as np

D = 32  # embedding dim
H = 32  # hidden dim
_SEED = 42


def _rng(tag: str) -> np.random.Generator:
    h = hashlib.blake2b(f"{_SEED}:{tag}".encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(h, "little"))


def _mm(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """BLAS-free matmul: np.einsum with optimize=False runs a fixed-order
    single-threaded sum-of-products, so results are bit-identical in any
    process regardless of OPENBLAS/OMP thread count. `@` is NOT — OpenBLAS
    picks kernels by thread count, and the low bits drift between the
    executor workers and the golden generator (measured: 3% of probs).
    Dims here are tiny (D=H=32), so the naive path costs nothing.
    """
    return np.einsum("ij,jk->ik", np.atleast_2d(a), np.atleast_2d(b), optimize=False)


class DeterministicGLiREL:
    """Process-level singleton (one per executor python worker)."""

    _instance: "DeterministicGLiREL | None" = None

    @classmethod
    def get(cls) -> "DeterministicGLiREL":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def __init__(self) -> None:
        # fixed seeded weights (the "checkpoint")
        self.W_start = _rng("W_start").standard_normal((D, H)) / np.sqrt(D)
        self.W_end = _rng("W_end").standard_normal((D, H)) / np.sqrt(D)
        self.W_span = _rng("W_span").standard_normal((2 * H, H)) / np.sqrt(2 * H)
        self.W_pair = _rng("W_pair").standard_normal((2 * H, H)) / np.sqrt(2 * H)
        self.W_prompt1 = _rng("W_prompt1").standard_normal((D, 4 * H)) / np.sqrt(D)
        self.W_prompt2 = _rng("W_prompt2").standard_normal((4 * H, H)) / np.sqrt(4 * H)
        self.rel_marker = _rng("[REL]").standard_normal(D)
        self._tok_cache: dict[str, np.ndarray] = {}
        self._label_cache: dict[tuple[str, ...], np.ndarray] = {}

    # --- embeddings ---------------------------------------------------------

    def embed_token(self, tok: str) -> np.ndarray:
        v = self._tok_cache.get(tok)
        if v is None:
            v = _rng(f"tok:{tok}").standard_normal(D)
            self._tok_cache[tok] = v
        return v

    def embed_matrix(self, uniques) -> np.ndarray:
        """[U, D] embeddings for an array of unique tokens — the blake2b
        seeding runs once per NEW token per process (cached), so a batch
        of documents costs one gather, not a per-token Python loop."""
        return np.stack([self.embed_token(t) for t in uniques]) if len(uniques) else np.zeros((0, D))

    @staticmethod
    def mix_context(e: np.ndarray) -> np.ndarray:
        """+-1-token window-mean context mixing (deterministic stand-in
        for T2-T8) over a [n, D] embedding matrix."""
        n = len(e)
        if n == 0:
            return np.zeros((0, D))
        ctx = e.copy()
        ctx[1:] += e[:-1]
        ctx[:-1] += e[1:]
        denom = np.full((n, 1), 3.0)
        denom[0] = denom[-1] = 2.0
        if n == 1:
            denom[0] = 1.0
        return ctx / denom

    def encode_tokens(self, tokens: list[str]) -> np.ndarray:
        """[n, D] token reps (embed + context mix)."""
        if not tokens:
            return np.zeros((0, D))
        return self.mix_context(np.stack([self.embed_token(t) for t in tokens]))

    # --- label reps (T1/T7/T12), cached per label-set -----------------------

    def label_reps(self, labels: tuple[str, ...]) -> np.ndarray:
        out = self._label_cache.get(labels)
        if out is None:
            reps = []
            for lab in labels:
                words = lab.split(" ")
                w = np.mean([self.embed_token(w_) for w_ in words], axis=0)
                both = (self.rel_marker + w) / 2.0  # 'both' strategy
                h = _mm(np.maximum(_mm(both, self.W_prompt1), 0.0), self.W_prompt2)[0]
                reps.append(h)
            out = np.stack(reps)  # [C, H]
            self._label_cache[labels] = out
        return out

    # --- span/pair reps (T9/T11) ---------------------------------------------

    def span_reps(self, token_reps: np.ndarray, spans: np.ndarray) -> np.ndarray:
        """markerv1: relu(FFN(start) ⊕ FFN(end)) -> project. spans [k,2]
        inclusive indices."""
        starts = _mm(token_reps[spans[:, 0]], self.W_start)
        ends = _mm(token_reps[spans[:, 1]], self.W_end)
        cat = np.maximum(np.concatenate([starts, ends], axis=1), 0.0)
        return _mm(cat, self.W_span)  # [k, H]

    @staticmethod
    def pair_indices(n: int, starts: np.ndarray,
                     max_distance: int | None) -> np.ndarray:
        """Row-major (i, j), i != j, |start_i - start_j| <= D — the exact
        ordering contract of generate_entity_pairs_indices
        (base.py:59-109, proven by test_rel_rep.py). np.argwhere scans in
        C (row-major) order, preserving the contract."""
        s = np.asarray(starts, dtype=np.int64)
        mask = ~np.eye(n, dtype=bool)
        if max_distance is not None:
            mask &= np.abs(s[:, None] - s[None, :]) <= max_distance
        return np.argwhere(mask).astype(np.int64)

    @staticmethod
    def valid_spans(spans: np.ndarray, n_tokens: int) -> np.ndarray:
        """P4 valid-span mask (base.py:222-227): drop spans whose end
        exceeds the (possibly truncated) sequence. Callers that map the
        returned pair indices back to span rows MUST apply this filter
        themselves first — score_doc scores the filtered array."""
        if len(spans):
            return spans[spans[:, 1] <= n_tokens - 1]
        return spans

    def score_doc(
        self,
        tokens: list[str],
        spans: np.ndarray,
        labels: tuple[str, ...],
        max_distance: int | None,
        tok_reps: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (pairs [P,2] span-list indices, probs [P, C]).

        Pair indices refer to the VALID (P4-filtered) span array, i.e.
        ``valid_spans(spans, len(tokens))`` — identical to ``spans`` when
        every span lies within the sequence."""
        spans = self.valid_spans(spans, len(tokens))
        if tok_reps is None:
            tok_reps = self.encode_tokens(tokens)
        sreps = self.span_reps(tok_reps, spans)  # [k, H]
        pidx = self.pair_indices(len(spans), spans[:, 0], max_distance)
        if len(pidx) == 0:
            return pidx, np.zeros((0, len(labels)))
        pair = np.concatenate([sreps[pidx[:, 0]], sreps[pidx[:, 1]]], axis=1)
        prep = np.maximum(pair, 0.0)
        prep = _mm(prep, self.W_pair)  # [P, H]
        lreps = self.label_reps(labels)  # [C, H]
        logits = _mm(prep, lreps.T)  # T13 einsum('BKD,BCD->BKC') per doc
        probs = 1.0 / (1.0 + np.exp(-logits))
        return pidx, probs
