"""CLIP BPE tokenizer tests.

Golden ids are the published CLIP tokenization of canonical prompts (the
same ids the reference's bundled tokenizer produces; sot=49406, eot=49407,
"a photo of a" = [320, 1125, 539, 320]).
"""
import numpy as np
import pytest

from ttl_tpu.tokenizer.bpe import ClipTokenizer, tokenize


@pytest.fixture(scope="module")
def tk():
    return ClipTokenizer()


def test_vocab_layout(tk):
    assert tk.vocab_size == 49408
    assert tk.sot_id == 49406
    assert tk.eot_id == 49407
    # byte-level singles occupy [0, 512): "a</w>" sits at 256 + pos('a')
    assert tk.encoder["a</w>"] == 320


def test_golden_prompt_ids(tk):
    assert tk.encode("a photo of a") == [320, 1125, 539, 320]
    assert tk.encode("a photo of a cat.") == [320, 1125, 539, 320, 2368, 269]


def test_case_and_whitespace_normalization(tk):
    assert tk.encode("A  Photo\tOF a") == tk.encode("a photo of a")


def test_roundtrip_classnames(tk):
    import json
    from pathlib import Path
    names = json.loads(
        (Path("ttl_tpu/data/assets/imagenet_classnames.json")).read_text())
    for name in names[::97]:
        ids = tk.encode(f"a photo of a {name}.")
        assert 0 < len(ids) < 75
        # decode renders each </w> as a space (as CLIP's own decoder does),
        # so compare space-insensitively
        decoded = tk.decode(ids).replace(" ", "")
        assert decoded == f"a photo of a {name.lower()}.".replace(" ", "")


def test_tokenize_framing(tk):
    out = tokenize(["a photo of a dog."])
    assert out.shape == (1, 77)
    assert out[0, 0] == 49406
    row = out[0]
    eot_pos = int(np.argmax(row))  # eot is the max id in any sequence
    assert row[eot_pos] == 49407
    assert (row[eot_pos + 1:] == 0).all()


def test_tokenize_overflow_raises(tk):
    with pytest.raises(RuntimeError):
        tokenize("word " * 100)
    out = tokenize("word " * 100, truncate=True)
    assert out.shape == (1, 77) and out[0, -1] == 49407


def test_all_dataset_classnames_fit(tk):
    import json
    from pathlib import Path
    tables = json.loads(
        (Path("ttl_tpu/data/assets/dataset_classnames.json")).read_text())
    for name, classes in tables.items():
        toks = tokenize([f"a photo of a {c.replace('_', ' ')}." for c in classes])
        assert toks.shape[1] == 77
