"""Export a GLiREL torch checkpoint to the engine's .npz weight format.

Usage (on a machine WITH torch; this sandbox has none, so the script
is import-gated and the mapping below is the documented contract):

    python tools/export_weights.py pytorch_model.bin weights.npz
    GLIREL_NUMPY_CHECKPOINT=weights.npz spark-submit ... jobs/run_pipeline.py --scorer neural

Mapping (reference module -> DeterministicGLiREL attribute; see
glirel_spark/model/scorer.py for the consuming shapes). The reference
BiLSTM is torch nn.LSTM(bidirectional=True) inside LstmSeq2SeqEncoder
(reference glirel/modules/layers.py:9-30); torch stores per-direction
weights as [4H', in] / [4H', H'] with gate rows in (i, f, g, o) order —
the engine uses the same gate order but column-major application
(x @ Wx), hence the transposes. torch keeps two bias vectors
(b_ih + b_hh); the engine folds them into one.

| npz key       | torch tensor                               |
|---------------|--------------------------------------------|
| lstm_fwd_Wx   | rnn.lstm.weight_ih_l0.T                    |
| lstm_fwd_Wh   | rnn.lstm.weight_hh_l0.T                    |
| lstm_fwd_b    | rnn.lstm.bias_ih_l0 + rnn.lstm.bias_hh_l0  |
| lstm_bwd_Wx   | rnn.lstm.weight_ih_l0_reverse.T            |
| lstm_bwd_Wh   | rnn.lstm.weight_hh_l0_reverse.T            |
| lstm_bwd_b    | bias_ih_l0_reverse + bias_hh_l0_reverse    |

Projection weights (span/pair/prompt FFNs) map by the same
transpose-to-column-major rule from their reference Linear layers
(span_rep_layer / rel_rep_layer / prompt_rep_layer); exact reference
names vary by config, so the CLI takes --map KEY=TORCH_NAME overrides
for anything beyond the BiLSTM block.
"""

from __future__ import annotations

import sys


def export(src: str, dest: str, extra_map: dict[str, str] | None = None) -> None:
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
    out: dict[str, "np.ndarray"] = {}
    lstm = {
        "lstm_fwd_Wx": ("rnn.lstm.weight_ih_l0", True),
        "lstm_fwd_Wh": ("rnn.lstm.weight_hh_l0", True),
        "lstm_bwd_Wx": ("rnn.lstm.weight_ih_l0_reverse", True),
        "lstm_bwd_Wh": ("rnn.lstm.weight_hh_l0_reverse", True),
    }
    for key, (name, transpose) in lstm.items():
        t = sd[name].detach().numpy().astype("float64")
        out[key] = t.T if transpose else t
    out["lstm_fwd_b"] = (
        sd["rnn.lstm.bias_ih_l0"] + sd["rnn.lstm.bias_hh_l0"]
    ).detach().numpy().astype("float64")
    out["lstm_bwd_b"] = (
        sd["rnn.lstm.bias_ih_l0_reverse"] + sd["rnn.lstm.bias_hh_l0_reverse"]
    ).detach().numpy().astype("float64")
    for key, name in (extra_map or {}).items():
        out[key] = sd[name].detach().numpy().astype("float64").T
    np.savez(dest, **out)
    print(f"wrote {dest}: {sorted(out)}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--map")]
    maps = dict(
        a.split("=", 1)[1].split(":", 1)
        for a in sys.argv[1:]
        if a.startswith("--map=")
    )
    if len(args) != 2:
        raise SystemExit(__doc__)
    export(args[0], args[1], maps)


if __name__ == "__main__":
    main()
