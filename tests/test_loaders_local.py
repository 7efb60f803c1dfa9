"""Local-first dataset loading (C17) exercised offline via save_to_disk."""

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")

from iron_weight_only_quant_tpu.data import loaders  # noqa: E402


class FakeTokenizer:
    """Word-index tokenizer standing in for the slow HF tokenizer."""

    def __init__(self):
        self.vocab = {}

    def __call__(self, text, return_tensors=None):
        ids = [self.vocab.setdefault(w, len(self.vocab) + 2)
               for w in text.split()]

        class Enc:
            input_ids = np.asarray([ids], dtype=np.int64)

        return Enc()


@pytest.fixture
def local_wikitext(tmp_path, monkeypatch):
    train = datasets.Dataset.from_dict(
        {"text": [f"token{i} alpha beta gamma delta" for i in range(64)]}
    )
    test = datasets.Dataset.from_dict(
        {"text": [f"eval{i} one two three" for i in range(32)]}
    )
    dd = datasets.DatasetDict({"train": train, "test": test})
    dd.save_to_disk(str(tmp_path / "wikitext"))
    monkeypatch.setenv(loaders.LOCAL_DIR_ENV, str(tmp_path))
    monkeypatch.setattr(loaders, "_tokenizer", lambda model: FakeTokenizer())
    return tmp_path


def test_wikitext2_local_first(local_wikitext):
    train, test = loaders.get_loaders("wikitext2", nsamples=3, seed=0, seqlen=16,
                                      model="ignored")
    assert len(train) == 3
    assert all(s.input_ids.shape == (1, 16) for s in train)
    assert test.input_ids.ndim == 2 and test.input_ids.shape[1] > 16

    # seeded windows are deterministic
    train2, _ = loaders.get_loaders("wikitext2", nsamples=3, seed=0, seqlen=16,
                                    model="ignored")
    np.testing.assert_array_equal(train[0].input_ids, train2[0].input_ids)


def test_ptb_local_first(tmp_path, monkeypatch):
    train = datasets.Dataset.from_dict(
        {"sentence": [f"s{i} the cat sat" for i in range(64)]}
    )
    val = datasets.Dataset.from_dict(
        {"sentence": [f"v{i} a dog ran" for i in range(32)]}
    )
    dd = datasets.DatasetDict({"train": train, "validation": val, "test": val})
    dd.save_to_disk(str(tmp_path / "ptb"))
    monkeypatch.setenv(loaders.LOCAL_DIR_ENV, str(tmp_path))
    monkeypatch.setattr(loaders, "_tokenizer", lambda model: FakeTokenizer())

    train_l, test = loaders.get_loaders("ptb", nsamples=2, seed=1, seqlen=8,
                                        model="x")
    assert len(train_l) == 2
    # ptb-new uses the test split and space joining
    train_n, test_n = loaders.get_loaders("ptb-new", nsamples=2, seed=1, seqlen=8,
                                          model="x")
    assert test_n.input_ids.shape[1] > 0
