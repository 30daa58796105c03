"""Fallback tokenizer stack.

The reference needs downloaded AutoTokenizer assets
(reference models/medtsllm.py:206-217); this framework ships a real
in-repo byte-level BPE (tools/build_fallback_bpe.py) so prompting is
hermetic. These tests pin its contract: exact round-trips (no hash
collisions), deterministic ids, Llama-2-like token counts on the actual
prompt formats, and the resolution order in get_tokenizer."""

import numpy as np
import pytest

from medtsllm_tpu.models.llm.tokenizer import (
    BPETokenizer, WordTokenizer, get_tokenizer,
)

STATS_PROMPT = (
    "Input statistics (per feature): min values = 0.1375, max values = "
    "4.821, median values = 2.479, the trend of input is upward, the top "
    "5 lags are [31, 254, 96, 12, 510]."
)
DATASET_PROMPT = (
    "Dataset: The BIDMC dataset is a dataset of electrocardiogram (ECG) "
    "and photoplethysmogram (PPG) signals recorded from intensive-care "
    "patients."
)


def test_bpe_round_trip_exact():
    tok = BPETokenizer()
    for text in (STATS_PROMPT, DATASET_PROMPT, "Time series:"):
        ids = tok.encode(text)
        assert tok.decode(ids) == text  # no collisions, lossless


def test_bpe_deterministic():
    a, b = BPETokenizer(), BPETokenizer()
    assert a.encode(STATS_PROMPT) == b.encode(STATS_PROMPT)


def test_bpe_token_counts_realistic():
    """Counts should look like a real subword tokenizer: prose near ~1.3
    tokens/word, digit-heavy stats prompts higher (Llama-2 spends one
    token per digit) — and nothing like the 4x blow-up of a byte-level
    fallback."""
    tok = BPETokenizer()
    prose_ratio = len(tok.encode(DATASET_PROMPT)) / len(DATASET_PROMPT.split())
    stats_ratio = len(tok.encode(STATS_PROMPT)) / len(STATS_PROMPT.split())
    assert 1.0 <= prose_ratio <= 2.0, prose_ratio
    assert 1.5 <= stats_ratio <= 3.0, stats_ratio
    assert len(tok.encode(STATS_PROMPT)) < len(STATS_PROMPT.encode()) / 2


def test_bpe_digit_splitting_like_llama2():
    tok = BPETokenizer()
    ids = tok.encode("value = 13755")
    # every digit is its own token, so the number contributes >= 5 ids
    base = len(tok.encode("value = "))
    assert len(ids) - base >= 5


def test_bpe_specials():
    tok = BPETokenizer()
    ids = tok.encode("<s>hello</s>")
    assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id
    assert tok.pad_token_id not in ids


def test_bpe_ids_fit_llama_vocab():
    tok = BPETokenizer()
    ids = tok.encode(STATS_PROMPT + DATASET_PROMPT)
    assert max(ids) < 16384  # embeds into any >=16384-vocab backbone


def test_resolution_prefers_bpe_for_large_vocab():
    tok = get_tokenizer("llama-1b", vocab_size=32000)
    assert isinstance(tok, BPETokenizer)


def test_resolution_word_hash_for_tiny_vocab():
    tok = get_tokenizer("llama-tiny", vocab_size=512)
    assert isinstance(tok, WordTokenizer)
    assert max(tok.encode(STATS_PROMPT)) < 512


def test_word_tokenizer_round_trip_words():
    tok = WordTokenizer(vocab_size=512)
    ids = tok.encode("hello world 42")
    assert tok.decode(ids) == "hello world 42"


@pytest.mark.parametrize("n_digits", [1, 3, 7])
def test_bpe_numbers_lossless(n_digits):
    tok = BPETokenizer()
    rng = np.random.default_rng(n_digits)
    num = "".join(str(d) for d in rng.integers(0, 10, n_digits))
    text = f"lag {num} end"
    assert tok.decode(tok.encode(text)) == text


def test_bpe_prompt_path_end_to_end():
    """Full PromptBuilder -> jit eval step with the BPE fallback engaged
    (llama-tiny-bpe preset: tiny body, 16384-token embedding)."""
    import io
    import contextlib

    from medtsllm_tpu.config import Config
    from medtsllm_tpu.tasks import get_trainer

    cfg = Config({
        "DEBUG": True, "task": "reconstruction", "model": "medtsllm",
        "history_len": 64, "pred_len": 64,
        "data": {"dataset": "synthetic", "mode": "multivariate",
                 "cols": "all", "normalize": True, "step": 32},
        "datasets": {"synthetic": {"n_points": 512, "n_features": 2}},
        "training": {"epochs": 1, "batch_size": 4, "optimizer": "adam",
                     "learning_rate": 1e-4, "dropout": 0.0, "loss": "mse",
                     "eval_metric": "mse", "eval_metric_direction": "min"},
        "models": {"medtsllm": {
            "d_model": 16, "d_ff": 32, "n_heads": 4, "num_tokens": 64,
            "covariate_mode": "concat",
            "embedding_downsample_mode": "linear",
            "patching": {"patch_len": 16, "stride": 8},
            "llm": {"enabled": True, "llm": "llama-tiny-bpe",
                    "llm_layers": -1},
        }},
        "setup": {"seed": 0, "device": "auto", "dtype": "float32",
                  "num_workers": 0, "logger": "print"},
    })
    with contextlib.redirect_stdout(io.StringIO()):
        trainer = get_trainer("t", cfg)
    tok = trainer.preprocessor.tokenizer
    assert isinstance(tok, BPETokenizer)
    batch = next(iter(trainer.val_pipeline))
    arrays = trainer.model_inputs(batch)
    ids = np.asarray(arrays["prompt_ids"])
    assert ids.max() < 16384 and ids.shape[1] >= 16
    out = trainer.eval_step(trainer.params, arrays)
    assert np.isfinite(np.asarray(out)).all()


def test_numerals_never_become_special_tokens():
    """Regression: a bare numeral in a prompt ('2', '01') must encode as
    normal text tokens, never as the EOS/BOS id it numerically equals —
    only the literal special strings map to special ids."""
    from medtsllm_tpu.models.llm.tokenizer import BPETokenizer, WordTokenizer
    b = BPETokenizer()
    assert b.encode("2") != [b.eos_token_id]
    assert b.decode(b.encode("2")) == "2"
    assert b.decode(b.encode("heart rate 72 / 2 bpm")) == \
        "heart rate 72 / 2 bpm"
    assert b.encode("<s>1") == [b.bos_token_id] + b.encode("1")
    b.encode("²")  # unicode digit: isdigit() true, int() raises
    w = WordTokenizer()
    assert w.encode("2") != [w.eos_token_id]
    ids = w.encode("<s>stats</s>")
    assert ids[0] == w.bos_token_id and ids[-1] == w.eos_token_id


def test_prompt_cache_eviction_survives_4097th_prompt():
    """Regression: the tokenization cache cleared itself AFTER inserting
    the 4097th distinct prompt and then read the evicted entry back —
    KeyError mid-epoch on any run with >4096 distinct prompt strings
    (stats prompts make nearly every window distinct)."""
    from medtsllm_tpu.models.medtsllm import PromptBuilder
    from medtsllm_tpu.models.llm.tokenizer import WordTokenizer
    pb = object.__new__(PromptBuilder)
    pb._cache = {}
    pb.tokenizer = WordTokenizer()
    for i in range(4100):
        ids = pb._encode(f"stats min {i} max {i + 1}")
        assert ids == pb._encode(f"stats min {i} max {i + 1}")
    assert len(pb._cache) <= 4096
