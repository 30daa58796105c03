"""Train the hermetic fallback BPE tokenizer asset.

The reference resolves tokenizers with ``AutoTokenizer`` and therefore
needs downloaded assets (reference models/medtsllm.py:206-217). This
environment has no tokenizer snapshots and no network, so the framework
ships a real byte-level BPE trained locally on (a) general English prose
extracted from the Python standard library's docstrings and (b) the
framework's own prompt domain (dataset/task descriptions and synthetic
input-statistics prompts covering float/int/lag-list formats).

Design choices mirror Llama-2's SentencePiece behaviour where it matters
for token counts on our prompts:
  - byte-level alphabet: no token is ever OOV (like SP byte fallback);
  - every digit is its own token (Llama-2 splits numbers digit-by-digit),
    so statistics-heavy prompts cost the same tokens they would under the
    real Llama-2 tokenizer;
  - whitespace is carried as a prefix on the following word piece.

Run:  python tools/build_fallback_bpe.py
Writes medtsllm_tpu/models/llm/assets/fallback_bpe.json (checked in; this
script only needs re-running to change the vocab).
"""

import ast
import sys
import sysconfig
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "medtsllm_tpu" / "models" / "llm" / "assets" / "fallback_bpe.json"
VOCAB_SIZE = 16384
SPECIALS = ["<pad>", "<s>", "</s>", "<unk>"]


def stdlib_docstrings(max_chars: int = 12_000_000) -> list[str]:
    """English prose: docstrings of the Python stdlib, deterministic order."""
    stdlib = Path(sysconfig.get_paths()["stdlib"])
    texts, total = [], 0
    for py in sorted(stdlib.rglob("*.py")):
        if "test" in py.parts or "site-packages" in py.parts:
            continue
        try:
            tree = ast.parse(py.read_text(errors="ignore"))
        except SyntaxError:
            continue
        for node in ast.walk(tree):
            if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                                 ast.AsyncFunctionDef)):
                doc = ast.get_docstring(node)
                if doc and len(doc) > 40:
                    texts.append(doc)
                    total += len(doc)
        if total > max_chars:
            break
    return texts


def domain_prompts(n: int = 20_000, seed: int = 0) -> list[str]:
    """Synthetic prompts matching PromptBuilder's formats (medtsllm.py
    reference :386-495): stats lines with floats, trends, lag lists."""
    sys.path.insert(0, str(REPO))
    from medtsllm_tpu.data.registry import dataset_lookup

    rng = np.random.default_rng(seed)
    out = []
    # dataset/task descriptions are what every single prompt starts with;
    # weight them so their words merge into whole-word tokens
    for cls in dataset_lookup.values():
        desc = getattr(cls, "description", None)
        if desc:
            out.extend([f"Dataset: {desc}"] * 500)
    out += [
        "Task: Forecast the next {} steps given the previous {} steps of "
        "data.".format(96, 512),
        "Task: Reconstruct the past 256 steps of data as accurately as "
        "possible using the following information.",
        "Task: Classify the past 512 steps of data as accurately as "
        "possible using the following information.",
        "Task: Identify the change points in the past 360 steps of data to "
        "segment the sequence.",
        "Time series:",
        "Patient description: 54 year old male with hypertension.",
    ]
    for _ in range(n):
        lo = rng.normal(0, 3) * 10.0 ** rng.integers(-3, 4)
        hi = lo + abs(rng.normal(0, 2)) * 10.0 ** rng.integers(-2, 3)
        med = (lo + hi) / 2
        lags = rng.integers(0, 512, size=5).tolist()
        trend = "upward" if rng.random() < 0.5 else "downward"
        out.append(
            f"Input statistics (per feature): min values = {lo:.4g}, "
            f"max values = {hi:.4g}, median values = {med:.4g}, "
            f"the trend of input is {trend}, the top 5 lags are {lags}.")
    return out


def main() -> None:
    from tokenizers import Regex, Tokenizer, decoders, models, \
        pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    # ByteLevel first (adds the space-prefix byte markers), THEN isolate
    # digits — the other order would give every digit its own Ġ marker and
    # break exact round-trips
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.ByteLevel(add_prefix_space=True, use_regex=True),
        pre_tokenizers.Split(Regex(r"\d"), behavior="isolated"),
    ])
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=VOCAB_SIZE, special_tokens=SPECIALS, show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())

    corpus = stdlib_docstrings() + domain_prompts()
    print(f"corpus: {len(corpus)} texts, "
          f"{sum(len(t) for t in corpus) / 1e6:.1f} MB")
    tok.train_from_iterator(corpus, trainer)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    tok.save(str(OUT))
    print(f"saved {OUT} vocab={tok.get_vocab_size()}")

    sample = ("Input statistics (per feature): min values = 0.1375, "
              "max values = 4.821, median values = 2.479, the trend of "
              "input is upward, the top 5 lags are [31, 254, 96, 12, 510].")
    enc = tok.encode(sample)
    print(f"sample: {len(sample.split())} words -> {len(enc.ids)} tokens")
    assert tok.decode(enc.ids) .strip() == sample, "round-trip failed"
    print("round-trip OK")


if __name__ == "__main__":
    main()
