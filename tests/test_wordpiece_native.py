"""Native C++ WordPiece tokenizer: parity with the Python tokenizer."""

import numpy as np
import pytest

from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab
from clover_tpu.data.wordpiece_native import NativeBertTokenizer, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no g++ / native build failed")

WORDS = "the a dog cat runs jumps quickly park happy cafe".split()


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    vocab = build_test_vocab(WORDS)
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    ordered = sorted(vocab.items(), key=lambda kv: kv[1])
    path.write_text("\n".join(tok for tok, _ in ordered) + "\n")
    return str(path)


@pytest.fixture(scope="module")
def tokenizers(vocab_file):
    return (BertTokenizer.from_vocab_file(vocab_file),
            NativeBertTokenizer(vocab_file))


@pytest.mark.parametrize("text", [
    "the dog runs",
    "The Dog RUNS quickly!",
    "dogs, cats; park?",
    "Café time",
    "supercalifragilistic dog",
    "",
    "a " * 50,
])
def test_parity_with_python(tokenizers, text):
    py, native = tokenizers
    ref = py.encode(text, max_length=20)
    got = native.encode(text, max_length=20)
    np.testing.assert_array_equal(got["token_ids"], ref["token_ids"], err_msg=text)
    np.testing.assert_array_equal(got["input_mask"], ref["input_mask"], err_msg=text)


def test_vocab_size(tokenizers):
    py, native = tokenizers
    assert native.vocab_size == py.vocab_size


def test_batch_encode(tokenizers):
    py, native = tokenizers
    texts = ["the dog runs", "cat jumps quickly", "happy park"]
    batch = native.encode_batch(texts, max_length=12)
    assert batch["token_ids"].shape == (3, 12)
    for i, t in enumerate(texts):
        ref = py.encode(t, max_length=12)
        np.testing.assert_array_equal(batch["token_ids"][i], ref["token_ids"])


def test_native_is_faster(tokenizers):
    import time

    py, native = tokenizers
    text = "the happy dog jumps quickly in the park " * 3
    n = 2000
    t0 = time.time()
    for _ in range(n):
        py.encode(text, max_length=40)
    t_py = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        native.encode(text, max_length=40)
    t_native = time.time() - t0
    assert t_native < t_py
