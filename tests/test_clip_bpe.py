"""CLIP byte-level BPE tokenizer tests (VERDICT round-1 item 3).

Covers: the byte<->unicode table invariants, hand-computed merge sequences,
reference padding semantics (BOS/EOS/PAD=EOS, max_length=77), and — the
acceptance gate — token-id parity with HF ``CLIPTokenizer`` loaded from the
same locally built vocab/merges files (reference: utils/text_utils.py:24-33).
"""

import json
import string

import numpy as np
import pytest

from stablediffusion_pytorch_tpu.data.clip_bpe import (
    ClipBpeTokenizer,
    bytes_to_unicode,
    clean_text,
    find_clip_vocab,
)

# ---------------------------------------------------------------------------
# a tiny but real vocab: every printable-ASCII char (plain and </w> forms)
# plus a handful of merges, so both our tokenizer and HF's can load it
# ---------------------------------------------------------------------------
_MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("c", "a"),
    ("ca", "t</w>"),
    ("d", "o"),
    ("do", "g</w>"),
    ("a", "t</w>"),
    ("o", "f</w>"),
    ("1", "2"),
]


def _build_vocab():
    chars = [c for c in string.printable if not c.isspace()]
    tokens = []
    for c in chars:
        tokens.append(c)
    for c in chars:
        tokens.append(c + "</w>")
    for a, b in _MERGES:
        tokens.append(a + b)
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    return {t: i for i, t in enumerate(tokens)}


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    with open(d / "vocab.json", "w") as f:
        json.dump(_build_vocab(), f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        f.writelines(f"{a} {b}\n" for a, b in _MERGES)
    return str(d)


@pytest.fixture(scope="module")
def tok(vocab_dir):
    return ClipBpeTokenizer.from_pretrained(vocab_dir)


class TestByteTable:
    def test_bijective_256(self):
        table = bytes_to_unicode()
        assert len(table) == 256
        assert len(set(table.values())) == 256

    def test_printable_identity(self):
        table = bytes_to_unicode()
        assert table[ord("a")] == "a"
        assert table[ord("!")] == "!"
        assert table[ord(" ")] != " "  # space remaps (non-printable class)


class TestBpeMerges:
    def test_hand_computed_merge_chain(self, tok):
        # "the": t+h -> "th"; th+e</w> -> "the</w>" (full merge)
        assert tok._bpe("the") == ["the</w>"]
        # "cat": c+a -> "ca"; ca+t</w> -> "cat</w>"
        assert tok._bpe("cat") == ["cat</w>"]
        # "at": a+t</w> merges (rank 6) -> "at</w>"
        assert tok._bpe("at") == ["at</w>"]
        # "tha": t+h merges, then th+a</w> has no rule -> ["th", "a</w>"]
        assert tok._bpe("tha") == ["th", "a</w>"]
        # "12" merges only in non-final position: pieces are "1","2</w>" and
        # the rule ("1","2") targets the plain form -> no merge applies
        assert tok._bpe("12") == ["1", "2</w>"]

    def test_single_char_word(self, tok):
        assert tok._bpe("a") == ["a</w>"]

    def test_encode_decode_roundtrip(self, tok):
        text = "the cat of the dog"
        assert tok.decode(tok.encode(text)) == text


class TestReferencePaddingSemantics:
    def test_bos_eos_pad(self, tok):
        ids, mask = tok(["the cat"], return_mask=True)
        assert ids.shape == (1, 77)
        assert ids[0, 0] == tok.bos_id
        row = [tok.vocab["the</w>"], tok.vocab["cat</w>"]]
        np.testing.assert_array_equal(ids[0, 1:3], row)
        assert ids[0, 3] == tok.eos_id
        assert (ids[0, 4:] == tok.pad_id).all()
        np.testing.assert_array_equal(mask[0, :4], 1)
        np.testing.assert_array_equal(mask[0, 4:], 0)

    def test_truncation_to_75_body_tokens(self, tok):
        ids = tok([" ".join(["cat"] * 200)])
        assert ids.shape == (1, 77)
        assert ids[0, 0] == tok.bos_id
        assert ids[0, -1] == tok.eos_id  # truncated rows still end with EOS
        assert (ids[0, 1:-1] == tok.vocab["cat</w>"]).all()

    def test_clean_text(self):
        assert clean_text("  A  &amp;  B\t\nC ") == "a & b c"


class TestHfParity:
    """Gate: with a vocab present, ids match HF CLIPTokenizer (slow, which in
    this ftfy-less env pre-splits with BasicTokenizer — fixtures are plain
    ASCII with single punctuation so both cleaning paths coincide)."""

    FIXTURES = [
        "the cat",
        "a photo of the cat",
        "dog dogs doggo",
        "cat , dog !",
        "the the the",
        "xyzzy frobnicate",  # unmergeable -> per-char tokens
        "1 2 3",
        "",
    ]

    @pytest.fixture(scope="class")
    def hf_tok(self, vocab_dir):
        transformers = pytest.importorskip("transformers")
        return transformers.CLIPTokenizer.from_pretrained(vocab_dir)

    def test_ids_match_hf(self, tok, hf_tok):
        for text in self.FIXTURES:
            ours = tok([text], return_mask=True)
            theirs = hf_tok([text], truncation=True, padding="max_length",
                            max_length=77, return_attention_mask=True)
            np.testing.assert_array_equal(
                ours[0][0], np.asarray(theirs["input_ids"][0]),
                err_msg=f"ids diverge on {text!r}")
            np.testing.assert_array_equal(
                ours[1][0], np.asarray(theirs["attention_mask"][0]),
                err_msg=f"mask diverges on {text!r}")


class TestDiscovery:
    def test_find_clip_vocab_env(self, vocab_dir, monkeypatch):
        monkeypatch.setenv("SDTPU_CLIP_TOKENIZER", vocab_dir)
        assert find_clip_vocab() == vocab_dir

    def test_find_clip_vocab_missing(self, monkeypatch, tmp_path):
        monkeypatch.delenv("SDTPU_CLIP_TOKENIZER", raising=False)
        monkeypatch.chdir(tmp_path)
        assert find_clip_vocab() is None

    def test_get_tokenizer_uses_bpe_when_vocab_present(
            self, vocab_dir, monkeypatch):
        from stablediffusion_pytorch_tpu.data.text import (
            get_tokenizer_and_model,
            text_provenance,
        )

        monkeypatch.setenv("SDTPU_CLIP_TOKENIZER", vocab_dir)
        tokenizer, model = get_tokenizer_and_model("clip")
        assert tokenizer.kind == "clip-bpe"
        prov = text_provenance(tokenizer, model)
        assert prov == {"tokenizer": "clip-bpe",
                        "text_encoder": "random-init"}
