"""TRIE binary writer (kenlm_spark/ngram/trie_writer.py).

The strongest check available anywhere: our writer's output is compared
BYTE-FOR-BYTE against the reference's own ``build_binary trie`` output —
on the vendored fixture and on fuzzed random ARPA models with suffix
holes (blank materialization) when the compiled reference is present.
"""

import os
import random
import subprocess
import sys

import pytest

from kenlm_spark.ngram.arpa import load_arpa
from kenlm_spark.ngram.binary import load_binary
from kenlm_spark.ngram.trie_writer import write_trie

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
ARPA = os.path.join(FIX, "test.arpa")
TRIE_KLM = os.path.join(FIX, "test_trie.klm")

SENTENCES = [
    "looking on a little more loin",
    "on a little more loin",
    "screening on considering",
    "foo bar zzz unknown",
]


VARIANTS = {
    "test_trie.klm": ({}, ["trie"]),
    "test_trie_quant.klm": (
        dict(quant_bits=8, backoff_bits=8), ["-q", "8", "-b", "8", "trie"],
    ),
    "test_trie_array.klm": (dict(array_bits=22), ["-a", "22", "trie"]),
    "test_trie_quant_array.klm": (
        dict(quant_bits=8, backoff_bits=8, array_bits=22),
        ["-a", "22", "-q", "8", "-b", "8", "trie"],
    ),
}


@pytest.mark.parametrize("fixture", sorted(VARIANTS))
def test_byte_identical_to_reference_fixture(tmp_path, fixture):
    """All four layouts (plain / quantized / Bhiksha array / both) must
    serialize to the exact bytes the reference's build_binary produced."""
    kwargs, _ = VARIANTS[fixture]
    out = str(tmp_path / "ours.klm")
    write_trie(ARPA, out, **kwargs)
    with open(out, "rb") as a, open(os.path.join(FIX, fixture), "rb") as b:
        assert a.read() == b.read()


def test_roundtrip_through_our_reader(tmp_path):
    out = str(tmp_path / "ours.klm")
    write_trie(ARPA, out)
    mt = load_binary(out)
    ma = load_arpa(ARPA)
    assert mt.order == ma.order and mt.vocab.keys() == ma.vocab.keys()
    for s in SENTENCES:
        for (p1, l1, o1), (p2, l2, o2) in zip(
            ma.full_scores(s), mt.full_scores(s)
        ):
            assert p2 == pytest.approx(p1, abs=1e-5)
            assert (l1, o1) == (l2, o2)


def test_missing_unk_synthesized(tmp_path):
    """A no-<unk> ARPA builds (the reference COMPLAINs and substitutes
    -100) — byte-identical to build_binary when present."""
    bb = "/tmp/refbuild/build_binary"
    if not os.path.exists(bb):
        pytest.skip("compiled reference not present")
    arpa = os.path.join(FIX, "test_nounk.arpa")
    ref_out = str(tmp_path / "ref.klm")
    subprocess.run([bb, "trie", arpa, ref_out], check=True,
                   capture_output=True)
    our_out = str(tmp_path / "our.klm")
    write_trie(arpa, our_out)
    with open(ref_out, "rb") as a, open(our_out, "rb") as b:
        assert a.read() == b.read()


def test_cli_trie_mode(tmp_path):
    from kenlm_spark.build_binary_cli import main

    out = str(tmp_path / "cli.klm")
    assert main(["trie", ARPA, out]) == 0
    with open(out, "rb") as a, open(TRIE_KLM, "rb") as b:
        assert a.read() == b.read()


def test_fuzz_byte_identical_vs_compiled_reference(tmp_path):
    """Fuzzed random ARPAs (suffix holes → blank materialization, random
    ±0.0 backoffs, optional order-3) must serialize to the EXACT bytes
    the reference's build_binary emits."""
    bb = "/tmp/refbuild/build_binary"
    if not os.path.exists(bb):
        pytest.skip("compiled reference not present")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from diff_reference import random_arpa

    rng = random.Random(20260816)
    done = 0
    tries = 0
    while done < 25 and tries < 200:
        tries += 1
        arpa = str(tmp_path / f"r{tries}.arpa")
        random_arpa(rng, arpa)
        with open(arpa) as fh:
            text = fh.read()
        if "<unk>" not in text:
            continue  # trie requires <unk>; generator emits it ~70%
        for fixture, (kwargs, flags) in VARIANTS.items():
            ref_out = str(tmp_path / f"ref{tries}.klm")
            our_out = str(tmp_path / f"our{tries}.klm")
            subprocess.run(
                [bb, *flags, arpa, ref_out], check=True, capture_output=True
            )
            write_trie(arpa, our_out, **kwargs)
            with open(ref_out, "rb") as a, open(our_out, "rb") as b:
                assert a.read() == b.read(), (arpa, fixture)
        done += 1
    assert done >= 20


def test_fuzz_deep_orders_byte_identical(tmp_path):
    """Order-4/5 random ARPAs (MULTIPLE bit-packed middle levels, deeper
    blank chains, per-level Bhiksha chop and quant tables) serialize to
    the reference's exact bytes in all four layouts."""
    bb = "/tmp/refbuild/build_binary"
    if not os.path.exists(bb):
        pytest.skip("compiled reference not present")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from diff_reference import random_arpa_deep

    rng = random.Random(424242)
    done = 0
    for t in range(40):
        arpa = str(tmp_path / f"d{t}.arpa")
        random_arpa_deep(rng, arpa)
        with open(arpa) as fh:
            if fh.read().split("ngram", 1)[1][:40].count("=") < 1:
                continue
        for fixture, (kwargs, flags) in VARIANTS.items():
            ref_out = str(tmp_path / "ref.klm")
            our_out = str(tmp_path / "our.klm")
            r = subprocess.run(
                [bb, *flags, arpa, ref_out], capture_output=True
            )
            if r.returncode != 0:
                break  # reference rejected this model; skip it entirely
            write_trie(arpa, our_out, **kwargs)
            with open(ref_out, "rb") as a, open(our_out, "rb") as b:
                assert a.read() == b.read(), (arpa, fixture)
        else:
            done += 1
        if done >= 15:
            break
    assert done >= 10


def test_fuzz_probing_byte_identical(tmp_path):
    """The ARPA-driven probing writer (file-order + blank-discovery-order
    insertion, ARPA header counts, probs stored as-read) matches
    build_binary's bytes; models the reference rejects at the default
    multiplier (blank overflow) are retried at -p 3.0 on both sides."""
    bb = "/tmp/refbuild/build_binary"
    if not os.path.exists(bb):
        pytest.skip("compiled reference not present")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from diff_reference import random_arpa, random_arpa_deep

    from kenlm_spark.ngram.binary_writer import write_probing_from_arpa

    rng = random.Random(1212)
    done = 0
    for t in range(60):
        arpa = str(tmp_path / f"p{t}.arpa")
        (random_arpa_deep if t % 2 else random_arpa)(rng, arpa)
        ref_out = str(tmp_path / "ref.klm")
        our_out = str(tmp_path / "our.klm")
        mult = 1.5
        r = subprocess.run([bb, "probing", arpa, ref_out], capture_output=True)
        if r.returncode:
            mult = 3.0
            r = subprocess.run(
                [bb, "-p", "3.0", "probing", arpa, ref_out],
                capture_output=True,
            )
            if r.returncode:
                continue
        write_probing_from_arpa(arpa, our_out, multiplier=mult)
        with open(ref_out, "rb") as a, open(our_out, "rb") as b:
            assert a.read() == b.read(), arpa
        done += 1
        if done >= 30:
            break
    assert done >= 20


def test_rest_probing_writer_byte_identical(tmp_path):
    """REST_PROBING (model type 1): write_probing_from_arpa(rest=True)
    matches the reference-generated fixture byte-for-byte, and — when
    the compiled driver is present — a freshly regenerated file too.
    With this, all SIX build_binary-family layouts have byte-exact
    writers."""
    from kenlm_spark.ngram.binary_writer import write_probing_from_arpa

    out = str(tmp_path / "rest.klm")
    write_probing_from_arpa(ARPA, out, rest=True)
    with open(out, "rb") as a, open(
        os.path.join(FIX, "test_rest_probing.klm"), "rb"
    ) as b:
        assert a.read() == b.read()
    drv = "/tmp/refbuild/make_rest_binary"
    if os.path.exists(drv):
        fresh = str(tmp_path / "fresh.klm")
        subprocess.run([drv, ARPA, fresh], check=True, capture_output=True)
        with open(out, "rb") as a, open(fresh, "rb") as b:
            assert a.read() == b.read()


def test_build_binary_extra_flags_byte_identical(tmp_path):
    """-u (unknown substitute), -v (omit vocab strings), and no-<unk>
    ARPAs match build_binary's bytes for both probing and trie."""
    bb = "/tmp/refbuild/build_binary"
    if not os.path.exists(bb):
        pytest.skip("compiled reference not present")
    from kenlm_spark.build_binary_cli import main as bb_main

    nounk = os.path.join(FIX, "test_nounk.arpa")

    cases = [
        (["-v", "probing"], ["-v", "probing"], ARPA),
        (["-v", "trie"], ["-v", "trie"], ARPA),
        (["probing"], ["probing"], nounk),
        (["trie"], ["trie"], nounk),
        (["-u", "-33.25", "probing"], ["-u", "-33.25", "probing"], nounk),
        (["-u", "-33.25", "trie"], ["-u", "-33.25", "trie"], nounk),
    ]
    for ref_flags, our_flags, arpa in cases:
        ref_out = str(tmp_path / "ref.klm")
        our_out = str(tmp_path / "our.klm")
        subprocess.run(
            [bb, *ref_flags, arpa, ref_out], check=True, capture_output=True
        )
        assert bb_main([*our_flags, arpa, our_out]) == 0
        with open(ref_out, "rb") as a, open(our_out, "rb") as b:
            assert a.read() == b.read(), (ref_flags, arpa)


def test_big_model_byte_identical_all_layouts(tmp_path):
    """47k-gram model (24k bigrams / 20k trigrams): byte-identity with
    build_binary across probing + all four trie layouts at a size where
    Bhiksha bit widths and quantization bins differ from the small
    fixtures (r5 — the prior fuzz never left toy sizes)."""
    bb = "/tmp/refbuild/build_binary"
    if not os.path.exists(bb):
        pytest.skip("compiled reference not present")
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import diff_reference as dr

    kenlm = dr.ensure_reference_module()
    dr.big_model_probing_leg(kenlm, n_sents=5)  # writes the big ARPA
    arpa = "/tmp/diffref_big.arpa"

    from kenlm_spark.ngram.binary_writer import write_probing_from_arpa

    cases = [
        ("probing", [], lambda o: write_probing_from_arpa(arpa, o)),
        ("trie", ["trie"], lambda o: write_trie(arpa, o)),
        (
            "trie_q",
            ["trie", "-q", "8", "-b", "8"],
            lambda o: write_trie(arpa, o, quant_bits=8, backoff_bits=8),
        ),
        (
            "trie_a",
            ["trie", "-a", "64"],
            lambda o: write_trie(arpa, o, array_bits=64),
        ),
        (
            "trie_qa",
            ["trie", "-q", "8", "-b", "8", "-a", "64"],
            lambda o: write_trie(
                arpa, o, quant_bits=8, backoff_bits=8, array_bits=64
            ),
        ),
    ]
    for name, flags, fn in cases:
        ref_out = str(tmp_path / f"{name}_ref.klm")
        our_out = str(tmp_path / f"{name}_ours.klm")
        args = [bb, *flags, arpa, ref_out] if flags else [bb, arpa, ref_out]
        subprocess.run(args, check=True, capture_output=True)
        fn(our_out)
        with open(ref_out, "rb") as a, open(our_out, "rb") as b:
            assert a.read() == b.read(), f"layout {name} diverged"
