"""Generate the committed WikiZSL-shaped evaluation fixture.

WikiZSL/FewRel evaluation files are reference-format JSONL (reference
README.md:150-185, eval.py:236-263): tokenized_text + end-inclusive
ner + relations with relation_text. The real splits cannot ship in
this sandbox (no network), so this writes a DETERMINISTIC fixture with
the same shape and the protocol's stress cases:

- zero-shot label set = the file's own relation vocabulary (the
  engine's refeval path reads labels from the file, eval.py:236-263)
- multi-token and multi-word entity mentions
- a '\\n ' token inside one document (the DeBERTa vanished-token
  alignment case, test_transformer_embeddings.py:226-244)
- a duplicate ner span with conflicting type (deterministic resolution)
- entity spans at position 0 and at the last token
- gold relations on pairs the scorer may or may not predict, so
  micro/macro P/R land strictly between 0 and 1

Usage: python tools/gen_refeval_fixture.py  (writes
fixtures/wikizsl_dev.jsonl; tools/gen_golden.py then replays the
protocol outside Spark and commits the expected per-label counts).
"""

from __future__ import annotations

import json
import random
import sys
from pathlib import Path

N_DOCS = 60
SEED = 20240817

LABELS = [
    "country",
    "educated at",
    "member of political party",
    "occupation",
    "place of birth",
]

PEOPLE = ["Ada Lovelace", "Alan Turing", "Grace Hopper", "Edsger Dijkstra",
          "Barbara Liskov", "Donald Knuth"]
PLACES = ["London", "Cambridge", "Amsterdam", "New York", "Eindhoven",
          "San Francisco"]
ORGS = ["University of Cambridge", "MIT", "Royal Society",
        "Bell Labs", "Stanford University"]
JOBS = ["mathematician", "engineer", "professor", "programmer"]
FILL = ["the", "a", "renowned", "was", "born", "in", "studied", "at",
        "worked", "as", "and", "later", "joined", "moved", "to", ",", "."]


def _entity_tokens(name: str) -> list[str]:
    return name.split(" ")


def make_doc(rng: random.Random, i: int) -> dict:
    person = rng.choice(PEOPLE)
    place = rng.choice(PLACES)
    org = rng.choice(ORGS)
    job = rng.choice(JOBS)

    tokens: list[str] = []
    ner: list[list] = []

    def add_entity(name: str, etype: str) -> tuple[int, int]:
        start = len(tokens)
        tokens.extend(_entity_tokens(name))
        end = len(tokens) - 1  # end-INCLUSIVE (reference ner convention)
        ner.append([start, end, etype, name])
        return start, end

    def add_fill(k: int) -> None:
        tokens.extend(rng.choice(FILL) for _ in range(k))

    p_pos = add_entity(person, "PERSON")
    add_fill(rng.randint(1, 3))
    tokens.extend(["was", "born", "in"])
    b_pos = add_entity(place, "LOC")
    if i % 5 == 0:
        tokens.append("\n ")  # vanished-token alignment probe
    add_fill(rng.randint(1, 4))
    tokens.extend(["studied", "at"])
    o_pos = add_entity(org, "ORG")
    add_fill(rng.randint(0, 2))
    tokens.extend(["worked", "as", "a"])
    j_pos = add_entity(job, "OCC")  # single token, may end the doc

    if i % 7 == 0:
        # duplicate span, conflicting type/text -> deterministic min-resolve
        ner.append([p_pos[0], p_pos[1], "AGENT", person.lower()])

    relations = []

    def rel(h: tuple[int, int], t: tuple[int, int], h_name: str, t_name: str,
            h_t: str, t_t: str, label: str) -> None:
        relations.append({
            "head": {"mention": h_name, "position": [h[0], h[1]], "type": h_t},
            "tail": {"mention": t_name, "position": [t[0], t[1]], "type": t_t},
            "relation_id": f"P{LABELS.index(label)}",
            "relation_text": label,
        })

    rel(p_pos, b_pos, person, place, "PERSON", "LOC", "place of birth")
    rel(p_pos, o_pos, person, org, "PERSON", "ORG", "educated at")
    if i % 2 == 0:
        rel(p_pos, j_pos, person, job, "PERSON", "OCC", "occupation")
    if i % 3 == 0:
        rel(o_pos, b_pos, org, place, "ORG", "LOC", "country")
    if i % 4 == 0:
        rel(b_pos, p_pos, place, person, "LOC", "PERSON",
            "member of political party")

    return {"tokenized_text": tokens, "ner": ner, "relations": relations}


def main() -> int:
    rng = random.Random(SEED)
    dest = Path(__file__).resolve().parent.parent / "fixtures"
    dest.mkdir(exist_ok=True)
    out = dest / "wikizsl_dev.jsonl"
    with out.open("w") as f:
        for i in range(N_DOCS):
            f.write(json.dumps(make_doc(rng, i), ensure_ascii=False) + "\n")
    print(f"wrote {out}: {N_DOCS} docs, labels={LABELS}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
