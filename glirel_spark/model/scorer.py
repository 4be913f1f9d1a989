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

This container has no torch and no network, so the transformer token
encoder (T2-T6) is replaced by a deterministic per-token embedding;
the T8 word-level re-encoder, however, is a REAL single-layer BiLSTM
(the same recurrence as layers.py:9-30 LstmSeq2SeqEncoder: PyTorch
(i, f, g, o) gate order, H/2 hidden per direction, concat to D),
run batched over the Arrow batch (time-major loop, so the python loop
is O(T), never O(docs x T)). Every other stage keeps the reference's
exact dataflow shape (same tensor shapes, same pair ordering contract
as generate_entity_pairs_indices / test_rel_rep.py).

Weights are pluggable: if ``GLIREL_NUMPY_CHECKPOINT`` names an ``.npz``
file, every parameter is loaded from it by attribute name (export from
a real torch checkpoint with
``np.savez(path, lstm_fwd_Wx=sd['rnn.lstm.weight_ih_l0'].T.numpy(), ...)``);
otherwise the seeded blake2b init below is the "checkpoint", keeping
the whole plane deterministic and golden-checkable. The Spark plumbing
(model-per-executor singleton, label-rep caching, Arrow batching) is
identical either way.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

D = 32  # embedding dim
H = 32  # hidden dim
HL = D // 2  # per-direction LSTM hidden (concat -> D)
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
        # T8 BiLSTM (layers.py:9-30): gates in PyTorch (i, f, g, o) order
        for d in ("fwd", "bwd"):
            setattr(self, f"lstm_{d}_Wx",
                    _rng(f"lstm_{d}_Wx").standard_normal((D, 4 * HL)) / np.sqrt(D))
            setattr(self, f"lstm_{d}_Wh",
                    _rng(f"lstm_{d}_Wh").standard_normal((HL, 4 * HL)) / np.sqrt(HL))
            setattr(self, f"lstm_{d}_b", np.zeros(4 * HL))
        ckpt = os.environ.get("GLIREL_NUMPY_CHECKPOINT")
        if ckpt:
            with np.load(ckpt) as z:
                for name in z.files:  # override by attribute name
                    cur = getattr(self, name)  # unknown name -> loud AttributeError
                    arr = np.asarray(z[name], dtype=np.float64)
                    if arr.shape != cur.shape:
                        raise ValueError(
                            f"checkpoint param {name}: shape {arr.shape} != {cur.shape}"
                        )
                    setattr(self, name, arr)
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

    def _lstm_dir(self, x: np.ndarray, Wx, Wh, b) -> np.ndarray:
        """One LSTM direction over a padded [B, T, D] batch -> [B, T, HL].

        The input projection is ONE einsum for the whole batch; the
        python loop runs over TIME only (T <= max_len), so the per-doc
        cost is a handful of [B, HL]-shaped vectorized steps. Rows
        evolve independently (the hidden matmul mixes hidden dims within
        a row, never across rows), so a doc's reps are bit-identical
        whether it is encoded alone or inside any batch — the property
        that lets gen_golden.py replay per-doc what the executors run
        batched."""
        bsz, t_len, _ = x.shape
        xp = np.einsum("btd,dk->btk", x, Wx, optimize=False) + b
        h = np.zeros((bsz, HL))
        c = np.zeros((bsz, HL))
        out = np.zeros((bsz, t_len, HL))
        for t in range(t_len):
            g = xp[:, t] + np.einsum("bh,hk->bk", h, Wh, optimize=False)
            i = 1.0 / (1.0 + np.exp(-g[:, :HL]))
            f = 1.0 / (1.0 + np.exp(-g[:, HL:2 * HL]))
            gg = np.tanh(g[:, 2 * HL:3 * HL])
            o = 1.0 / (1.0 + np.exp(-g[:, 3 * HL:]))
            c = f * c + i * gg
            h = o * np.tanh(c)
            out[:, t] = h
        return out

    def encode_batch(self, embs: list[np.ndarray]) -> list[np.ndarray]:
        """T8 BiLSTM over a batch of per-doc [n_i, D] embedding matrices
        -> per-doc [n_i, D] context reps (HL forward ⊕ HL backward).

        Forward runs on the zero-padded batch (causal: padding after a
        doc's length cannot reach its valid positions). Backward runs on
        each doc's OWN reversal (gathered per row), so padding never
        leaks into the recurrence there either.
        """
        lens = np.array([len(e) for e in embs], dtype=np.int64)
        t_len = int(lens.max(initial=0))
        if t_len == 0:
            return [np.zeros((0, D)) for _ in embs]
        bsz = len(embs)
        x = np.zeros((bsz, t_len, D))
        for r, e in enumerate(embs):
            x[r, : len(e)] = e
        fwd = self._lstm_dir(x, self.lstm_fwd_Wx, self.lstm_fwd_Wh, self.lstm_fwd_b)
        # per-doc reversal: rev_x[r, t] = x[r, len_r-1-t] for t < len_r
        ar = np.arange(t_len)
        ridx = np.clip(lens[:, None] - 1 - ar[None, :], 0, None)
        valid = ar[None, :] < lens[:, None]
        rev_x = np.where(
            valid[:, :, None], np.take_along_axis(x, ridx[:, :, None], axis=1), 0.0
        )
        rev = self._lstm_dir(rev_x, self.lstm_bwd_Wx, self.lstm_bwd_Wh, self.lstm_bwd_b)
        # un-reverse by gathering: bwd[r, s] = rev[r, len_r-1-s]; positions
        # past len_r read garbage but are sliced off below.
        bwd = np.take_along_axis(rev, ridx[:, :, None], axis=1)
        full = np.concatenate([fwd, bwd], axis=2)
        return [full[r, : lens[r]] for r in range(bsz)]

    def encode_tokens(self, tokens: list[str]) -> np.ndarray:
        """[n, D] token reps (embed + T8 BiLSTM), single-doc path."""
        if not tokens:
            return np.zeros((0, D))
        return self.encode_batch([np.stack([self.embed_token(t) for t in tokens])])[0]

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
