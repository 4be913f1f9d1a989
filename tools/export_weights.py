"""Export a GLiREL torch checkpoint to the engine's .npz weight format.

Usage (on a machine WITH torch; this sandbox has none, so the script
is import-gated and the mapping below is the documented contract):

    python tools/export_weights.py pytorch_model.bin weights.npz
    GLIREL_NUMPY_CHECKPOINT=weights.npz spark-submit ... jobs/run_pipeline.py --scorer neural

The export covers the FULL checkpoint: the transformer encoder (T2-T6,
glirel_spark/model/encoder.py), the hidden-size projection, the BiLSTM
re-encoder, and the span/pair/prompt FFN heads. Dimension vectors
(``dims`` = [D, H], ``enc_dims`` = [vocab, enc_hidden, layers, heads,
ffn, rel_k]) are inferred from the state dict and written alongside the
tensors, so the consuming model re-shapes itself — no hardcoded-dim
walls (scorer.py reads them before constructing any parameter).

Transformer mapping (HF DeBERTa-v2/v3 names under the reference's
``token_rep_layer.bert_layer.model.`` prefix -> engine ``enc_*`` names;
nn.Linear stores [out, in], the engine applies x @ W, hence the
transposes):

| npz key          | torch tensor (prefix stripped)                     |
|------------------|----------------------------------------------------|
| enc_emb          | embeddings.word_embeddings.weight                  |
| enc_ln_emb_g/b   | embeddings.LayerNorm.weight / .bias                |
| enc_P            | encoder.rel_embeddings.weight                      |
| enc_l{i}_Wq/wqb  | encoder.layer.{i}.attention.self.query_proj.weight.T / .bias |
| enc_l{i}_Wk/wkb  | ... key_proj ...                                   |
| enc_l{i}_Wv/wvb  | ... value_proj ...                                 |
| enc_l{i}_Wo/wob  | encoder.layer.{i}.attention.output.dense.weight.T / .bias |
| enc_l{i}_ln1_g/b | encoder.layer.{i}.attention.output.LayerNorm       |
| enc_l{i}_W1/b1   | encoder.layer.{i}.intermediate.dense.weight.T / .bias |
| enc_l{i}_W2/b2   | encoder.layer.{i}.output.dense.weight.T / .bias    |
| enc_l{i}_ln2_g/b | encoder.layer.{i}.output.LayerNorm                 |
| W_proj / b_proj  | token_rep_layer.projection.weight.T / .bias        |

Caveat for exact-parity runs: the engine's relative-position attention
clips distances to [-rel_k, rel_k]; DeBERTa-v3 additionally log-buckets
distances beyond half the bucket range. Set rel_k so that
2*rel_k+1 == rel_embeddings.shape[0] and sequence length stays within
the linear region, or extend encoder.forward's bucketing — the
parameter plane itself is complete either way.

BiLSTM mapping (torch nn.LSTM(bidirectional=True) inside
LstmSeq2SeqEncoder, reference glirel/modules/layers.py:9-30; torch
stores per-direction weights as [4H', in] / [4H', H'] with gate rows in
(i, f, g, o) order — the engine uses the same gate order but
column-major application (x @ Wx), hence the transposes. torch keeps
two bias vectors (b_ih + b_hh); the engine folds them into one):

| npz key       | torch tensor                               |
|---------------|--------------------------------------------|
| lstm_fwd_Wx   | rnn.lstm.weight_ih_l0.T                    |
| lstm_fwd_Wh   | rnn.lstm.weight_hh_l0.T                    |
| lstm_fwd_b    | rnn.lstm.bias_ih_l0 + rnn.lstm.bias_hh_l0  |
| lstm_bwd_Wx   | rnn.lstm.weight_ih_l0_reverse.T            |
| lstm_bwd_Wh   | rnn.lstm.weight_hh_l0_reverse.T            |
| lstm_bwd_b    | bias_ih_l0_reverse + bias_hh_l0_reverse    |

Head weights (span/pair/prompt FFNs) map by the same
transpose-to-column-major rule from their reference Linear layers
(span_rep_layer / rel_rep_layer / prompt_rep_layer); exact reference
names vary by config, so the CLI takes ``--map KEY=TORCH_NAME``
overrides (also accepted: ``--map=KEY=TORCH_NAME``) for anything
beyond the blocks above.
"""

from __future__ import annotations

import re
import sys

_ENC_PREFIX = "token_rep_layer.bert_layer.model."


def _enc_layer_map(i: int) -> dict[str, tuple[str, bool]]:
    """engine name -> (HF deberta tensor name, transpose?)."""
    a = f"encoder.layer.{i}.attention"
    return {
        f"enc_l{i}_Wq": (f"{a}.self.query_proj.weight", True),
        f"enc_l{i}_wqb": (f"{a}.self.query_proj.bias", False),
        f"enc_l{i}_Wk": (f"{a}.self.key_proj.weight", True),
        f"enc_l{i}_wkb": (f"{a}.self.key_proj.bias", False),
        f"enc_l{i}_Wv": (f"{a}.self.value_proj.weight", True),
        f"enc_l{i}_wvb": (f"{a}.self.value_proj.bias", False),
        f"enc_l{i}_Wo": (f"{a}.output.dense.weight", True),
        f"enc_l{i}_wob": (f"{a}.output.dense.bias", False),
        f"enc_l{i}_ln1_g": (f"{a}.output.LayerNorm.weight", False),
        f"enc_l{i}_ln1_b": (f"{a}.output.LayerNorm.bias", False),
        f"enc_l{i}_W1": (f"encoder.layer.{i}.intermediate.dense.weight", True),
        f"enc_l{i}_b1": (f"encoder.layer.{i}.intermediate.dense.bias", False),
        f"enc_l{i}_W2": (f"encoder.layer.{i}.output.dense.weight", True),
        f"enc_l{i}_b2": (f"encoder.layer.{i}.output.dense.bias", False),
        f"enc_l{i}_ln2_g": (f"encoder.layer.{i}.output.LayerNorm.weight", False),
        f"enc_l{i}_ln2_b": (f"encoder.layer.{i}.output.LayerNorm.bias", False),
    }


def export(src: str, dest: str, extra_map: dict[str, str] | None = None,
           heads: int = 12) -> None:
    try:
        import torch
    except ImportError as e:  # pragma: no cover - exercised in sandbox
        raise SystemExit(
            "torch is not available in this environment; run the export "
            "on a machine with torch installed (the mapping is documented "
            "in this file's docstring)"
        ) from e
    import numpy as np

    sd = torch.load(src, map_location="cpu")

    def grab(name: str, transpose: bool) -> "np.ndarray":
        t = sd[name].detach().numpy().astype("float64")
        return t.T if transpose else t

    out: dict[str, "np.ndarray"] = {}

    # --- transformer encoder (optional: absent in head-only checkpoints)
    enc = {k[len(_ENC_PREFIX):]: k for k in sd if k.startswith(_ENC_PREFIX)}
    if enc:
        n_layers = 1 + max(
            int(m.group(1))
            for k in enc
            if (m := re.match(r"encoder\.layer\.(\d+)\.", k))
        )
        emb = grab(enc["embeddings.word_embeddings.weight"], False)
        rel = grab(enc["encoder.rel_embeddings.weight"], False)
        vocab, db = emb.shape
        ffn = sd[enc["encoder.layer.0.intermediate.dense.bias"]].shape[0]
        out["enc_emb"] = emb
        out["enc_ln_emb_g"] = grab(enc["embeddings.LayerNorm.weight"], False)
        out["enc_ln_emb_b"] = grab(enc["embeddings.LayerNorm.bias"], False)
        out["enc_P"] = rel
        for i in range(n_layers):
            for key, (name, tr) in _enc_layer_map(i).items():
                out[key] = grab(enc[name], tr)
        rel_k = (rel.shape[0] - 1) // 2
        # heads is config metadata the state dict does not carry: pass
        # --heads (deberta-v3-large: 16; -small/-base: 12)
        out["enc_dims"] = np.array([vocab, db, n_layers, heads, ffn, rel_k])
    proj_w = "token_rep_layer.projection.weight"
    if proj_w in sd:
        out["W_proj"] = grab(proj_w, True)
        out["b_proj"] = grab("token_rep_layer.projection.bias", False)

    # --- BiLSTM re-encoder
    lstm = {
        "lstm_fwd_Wx": ("rnn.lstm.weight_ih_l0", True),
        "lstm_fwd_Wh": ("rnn.lstm.weight_hh_l0", True),
        "lstm_bwd_Wx": ("rnn.lstm.weight_ih_l0_reverse", True),
        "lstm_bwd_Wh": ("rnn.lstm.weight_hh_l0_reverse", True),
    }
    for key, (name, transpose) in lstm.items():
        out[key] = grab(name, transpose)
    out["lstm_fwd_b"] = (
        sd["rnn.lstm.bias_ih_l0"] + sd["rnn.lstm.bias_hh_l0"]
    ).detach().numpy().astype("float64")
    out["lstm_bwd_b"] = (
        sd["rnn.lstm.bias_ih_l0_reverse"] + sd["rnn.lstm.bias_hh_l0_reverse"]
    ).detach().numpy().astype("float64")

    # --- scorer dims from the LSTM shapes: D = input width, H likewise
    d = out["lstm_fwd_Wx"].shape[0]
    out["dims"] = np.array([d, d])

    for key, name in (extra_map or {}).items():
        out[key] = grab(name, True)
    np.savez(dest, **out)
    print(f"wrote {dest}: {sorted(out)}")


def main() -> None:
    argv = sys.argv[1:]
    args: list[str] = []
    maps: dict[str, str] = {}
    heads = 12
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--heads":
            i += 1
            heads = int(argv[i])
        elif a.startswith("--heads="):
            heads = int(a[len("--heads="):])
        elif a == "--map":  # --map KEY=TORCH_NAME (the documented form)
            i += 1
            if i >= len(argv) or "=" not in argv[i]:
                raise SystemExit("--map expects KEY=TORCH_NAME")
            k, v = argv[i].split("=", 1)
            maps[k] = v
        elif a.startswith("--map="):  # --map=KEY=TORCH_NAME also accepted
            body = a[len("--map="):]
            if "=" not in body:
                raise SystemExit("--map expects KEY=TORCH_NAME")
            k, v = body.split("=", 1)
            maps[k] = v
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        raise SystemExit(__doc__)
    export(args[0], args[1], maps, heads)


if __name__ == "__main__":
    main()
