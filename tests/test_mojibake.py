"""Mojibake repair (ops/curation.mojibake_repair): single and double
encodings fixed, legit lookalike text strictly untouched, null-safe,
Dataset surface."""

import numpy as np
import pyarrow as pa

from tangent_ray.ops.curation import (
    _try_repair,
    mojibake_repair,
    mojibake_repair_batch,
)


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def _moji(s: str, rounds: int = 1) -> str:
    """Synthesize mojibake: decode UTF-8 bytes as cp1252-with-latin1-gaps,
    ``rounds`` times."""
    for _ in range(rounds):
        out = []
        for b in s.encode("utf-8"):
            try:
                out.append(bytes([b]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(b))
        s = "".join(out)
    return s


def test_repairs_single_and_double_encodings():
    originals = [
        "café", "naïve résumé", "don’t say “mojibake”", "über—dash",
        "€99 • São Paulo", "日本語のテキスト",
    ]
    for orig in originals:
        for rounds in (1, 2):
            broken = _moji(orig, rounds)
            if broken == orig:
                continue
            assert _try_repair(broken) == orig, (orig, rounds)


def test_legit_lookalikes_untouched():
    # real text that contains signature chars but is NOT mojibake: the
    # strict UTF-8 round-trip fails, so it must pass through unchanged
    legit = [
        "Ã is a letter used in Portuguese and Guaraní",
        "SÃO is wrong caps but valid text",
        "Â la carte (sic)",
        "maçã and pão are proper UTF-8 already",
        "plain ascii stays plain ascii",
    ]
    for s in legit:
        assert _try_repair(s) is None, s


def test_multiplication_sign_typography_never_repaired():
    """The cp1252 bytes of 'x-sign + NBSP' are VALID UTF-8 (Hebrew), so a
    naive round-trip gate would rewrite dimension typography into Hebrew;
    the x-sign lead is excluded from the trigger signature."""
    legit = [
        "800 ×\xa0600 resolution",
        "3×¾ inch bolts",
        "a 2×3 matrix and 4 × 5 grid",
        "÷ and × are operators",
    ]
    for s in legit:
        assert _try_repair(s) is None, s
    # but inside a doc with UNAMBIGUOUS mojibake, the x-pair rides along
    # (if the doc was corrupted, those bytes really were the other script)
    mixed = "cafÃ© at 800 ×\xa0600"
    fixed = _try_repair(mixed)
    assert fixed is not None and fixed.startswith("café")


def test_partial_ladder_never_emitted():
    """A string where the undo stalls with unambiguous signatures left
    must pass through unchanged, not come out half-repaired."""
    # valid single-layer mojibake + a byte sequence that breaks round 2's
    # strict decode while still carrying a strong signature
    stuck = _moji("café", 1) + " Ã" + chr(0x2603)  # snowman: no 1-byte inverse
    assert _try_repair(stuck) is None


def test_batch_surface_and_nulls(ray_session):
    import ray
    import ray.data

    texts = ["cafÃ©", "fine text", None, "", _moji("don’t", 2)]
    out = mojibake_repair_batch(_docs(texts))
    assert out["text"].to_pylist() == ["café", "fine text", None, "", "don’t"]
    assert out["repaired"].to_pylist() == [True, False, False, False, True]
    # Dataset surface
    ds = ray.data.from_arrow(_docs(texts))
    rows = sorted(
        (r["doc_id"], r["text"], r["repaired"])
        for r in mojibake_repair(ds).take_all()
    )
    assert rows[0] == (0, "café", True)
    assert rows[2] == (2, None, False)
