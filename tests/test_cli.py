"""CLI twins: query_cli vs the compiled reference `query` binary, and
lmplz_cli producing an ARPA the reference itself loads and scores."""

import io
import os
import re
import subprocess
import sys

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
ARPA = os.path.join(FIX, "test.arpa")

CORPUS = "looking on a little more loin\nfoo bar zzz unknown\non a little more loin\n"


def _run_ours(argv, stdin_text):
    from kenlm_spark.query_cli import main

    old_in, old_out = sys.stdin, sys.stdout
    sys.stdin = io.StringIO(stdin_text)
    sys.stdout = io.StringIO()
    try:
        main(argv)
        return sys.stdout.getvalue()
    finally:
        sys.stdin, sys.stdout = old_in, old_out


def _parse(output: str):
    """(per-word tuples, per-line totals, summary floats) — parsed, since
    C++ prints more float digits than %g."""
    words, lines, summary = [], [], {}
    for ln in output.splitlines():
        for m in re.finditer(r"(\S+)=(\d+) (\d+) (-?[\d.e+-]+)\t", ln):
            words.append((m.group(1), int(m.group(2)), int(m.group(3)),
                          float(m.group(4))))
        m = re.search(r"Total: (-?[\d.e+-]+) OOV: (\d+)", ln)
        if m:
            lines.append((float(m.group(1)), int(m.group(2))))
        m = re.match(r"(Perplexity [^:]+|OOVs|Tokens):\t(-?[\d.e+-]+)", ln)
        if m:
            summary[m.group(1)] = float(m.group(2))
    return words, lines, summary


def test_query_cli_matches_reference_binary():
    ref_bin = "/tmp/refbuild/query"
    if not os.path.exists(ref_bin):
        pytest.skip("compiled reference query binary not present")
    theirs = subprocess.run(
        [ref_bin, ARPA], input=CORPUS, capture_output=True, text=True,
    ).stdout
    ours = _run_ours([ARPA], CORPUS)
    w1, l1, s1 = _parse(ours)
    w2, l2, s2 = _parse(theirs)
    assert len(w1) == len(w2) and len(l1) == len(l2)
    for (a_w, a_id, a_n, a_p), (b_w, b_id, b_n, b_p) in zip(w1, w2):
        assert (a_w, a_id, a_n) == (b_w, b_id, b_n)
        assert a_p == pytest.approx(b_p, abs=1e-4)
    for (a_t, a_o), (b_t, b_o) in zip(l1, l2):
        assert a_o == b_o and a_t == pytest.approx(b_t, abs=1e-3)
    assert s1.keys() == s2.keys()
    for k in s1:
        assert s1[k] == pytest.approx(s2[k], rel=1e-4), k


def test_query_cli_null_context_and_verbosity():
    ref_bin = "/tmp/refbuild/query"
    if not os.path.exists(ref_bin):
        pytest.skip("compiled reference query binary not present")
    theirs = subprocess.run(
        [ref_bin, "-n", "-v", "summary", ARPA],
        input=CORPUS, capture_output=True, text=True,
    ).stdout
    ours = _run_ours(["-n", "-v", "summary", ARPA], CORPUS)
    _, _, s1 = _parse(ours)
    _, _, s2 = _parse(theirs)
    assert s1["Tokens"] == s2["Tokens"]  # no </s> appended
    for k in s1:
        assert s1[k] == pytest.approx(s2[k], rel=1e-4), k


def test_query_cli_binary_model():
    """The CLI loads binary layouts through the same dispatcher."""
    out = _run_ours([os.path.join(FIX, "test_trie_quant_array.klm")], CORPUS)
    _, lines, _ = _parse(out)
    assert lines[0][0] == pytest.approx(-1.568, abs=1e-3)


def test_lmplz_cli_roundtrip(tmp_path, spark):
    """lmplz_cli output parses in the COMPILED reference and scores
    identically to our own loader."""
    from kenlm_spark.lmplz_cli import main as lmplz_main

    corpus = tmp_path / "corpus.txt"
    corpus.write_text(
        "looking on a little more loin\n"
        "on a little more loin\n"
        "on foo little more loin\n"
        "bar\n"
    )
    arpa = str(tmp_path / "out.arpa")
    old_argv_master = ["-o", "3", "--text", str(corpus), "--arpa", arpa,
                       "--prune", "0", "--master", "local[4]"]
    lmplz_main(old_argv_master)

    from kenlm_spark.ngram.arpa import load_arpa

    ours = load_arpa(arpa)
    assert ours.order == 3
    s = "on a little more loin"
    assert ours.score(s) > -10

    sys.path.insert(0, "/tmp/refbuild")
    try:
        import kenlm as ref_kenlm
    except ImportError:
        pytest.skip("compiled reference binding not present")
    ref = ref_kenlm.Model(arpa)
    for sent in ["on a little more loin", "bar", "foo little zzz"]:
        assert ours.score(sent) == pytest.approx(
            ref.score(sent, bos=True, eos=True), abs=1e-4
        )


def test_build_binary_cli(tmp_path):
    """build_binary twin: ARPA -> probing .klm loadable on both sides."""
    from kenlm_spark.build_binary_cli import main as bb_main
    from kenlm_spark.ngram.arpa import load_arpa
    from kenlm_spark.ngram.binary import load_binary

    out = str(tmp_path / "out.klm")
    assert bb_main(["probing", ARPA, out]) == 0
    ma, mb = load_arpa(ARPA), load_binary(out)
    for s in ["looking on a little more loin", "foo bar zzz unknown"]:
        assert mb.score(s) == pytest.approx(ma.score(s), abs=1e-6)
    # trie write now supported (byte-identical tests in test_trie_writer)
    out_trie = str(tmp_path / "out_trie.klm")
    assert bb_main(["trie", ARPA, out_trie]) == 0
    assert load_binary(out_trie).score("foo bar zzz unknown") == pytest.approx(
        ma.score("foo bar zzz unknown"), abs=1e-6
    )
    # custom multiplier round-trips too
    out2 = str(tmp_path / "p3.klm")
    assert bb_main(["-p", "3.0", "probing", ARPA, out2]) == 0
    assert load_binary(out2).score("on a little more loin") == pytest.approx(
        ma.score("on a little more loin"), abs=1e-6
    )


def test_benchmark_cli_vocab_and_query(tmp_path):
    """kenlm_benchmark twin: -v id-stream conversion (width by vocab
    bound, EOS per line) then -q timed query; the probability sum must
    equal our model's sentence scores and — when the compiled reference
    binding is present — the reference's own scores for the same text."""
    from kenlm_spark.ngram.arpa import load_arpa

    sentences = [
        "looking on a little more loin",
        "on a little more loin",
        "screening on considering",
        "foo bar zzz unknown",
    ]
    text = "".join(s + "\n" for s in sentences)
    klm = os.path.join(FIX, "test_probing.klm")
    conv = subprocess.run(
        [sys.executable, "-m", "kenlm_spark.benchmark_cli", "-v", "-m", klm],
        input=text.encode(), capture_output=True,
    )
    assert conv.returncode == 0, conv.stderr
    m = load_arpa(ARPA)
    # width rule: 37-word vocab -> 1 byte/id; one EOS per line
    n_ids = sum(len(s.split()) + 1 for s in sentences)
    assert len(conv.stdout) == n_ids
    query = subprocess.run(
        [sys.executable, "-m", "kenlm_spark.benchmark_cli", "-q", "-m", klm],
        input=conv.stdout, capture_output=True,
    )
    assert query.returncode == 0, query.stderr
    out = query.stdout.decode()
    assert f"Queries: {n_ids}" in out
    assert "Queries per second excluding load" in out
    got = float(
        re.search(r"Probability sum: (\S+)", query.stderr.decode()).group(1)
    )
    expect = sum(m.score(s) for s in sentences)
    assert got == pytest.approx(expect, rel=1e-5)
    if os.path.exists("/tmp/refbuild"):
        sys.path.insert(0, "/tmp/refbuild")
        try:
            import kenlm as ref_kenlm
        except ImportError:
            return
        ref = ref_kenlm.Model(klm)
        ref_sum = sum(ref.score(s, bos=True, eos=True) for s in sentences)
        assert got == pytest.approx(ref_sum, rel=1e-5)


def test_benchmark_cli_threads_same_sum(tmp_path):
    """-t N (fork pool over contiguous sentence ranges) must report the
    same probability sum and query count as the single-process path, and
    an empty id stream must not raise (ZeroDivision guards)."""
    from kenlm_spark.ngram.arpa import load_arpa

    sentences = [
        "looking on a little more loin",
        "on a little more loin",
        "screening on considering",
        "foo bar zzz unknown",
    ] * 3
    text = "".join(s + "\n" for s in sentences)
    klm = os.path.join(FIX, "test_probing.klm")
    conv = subprocess.run(
        [sys.executable, "-m", "kenlm_spark.benchmark_cli", "-v", "-m", klm],
        input=text.encode(), capture_output=True,
    )
    query = subprocess.run(
        [sys.executable, "-m", "kenlm_spark.benchmark_cli", "-q", "-m", klm,
         "-t", "4"],
        input=conv.stdout, capture_output=True,
    )
    assert query.returncode == 0, query.stderr
    out = query.stdout.decode()
    assert "Threads: 4" in out
    got = float(
        re.search(r"Probability sum: (\S+)", query.stderr.decode()).group(1)
    )
    m = load_arpa(ARPA)
    expect = sum(m.score(s) for s in sentences)
    assert got == pytest.approx(expect, rel=1e-5)
    # empty stream: degenerate rates, no traceback
    empty = subprocess.run(
        [sys.executable, "-m", "kenlm_spark.benchmark_cli", "-q", "-m", klm],
        input=b"", capture_output=True,
    )
    assert empty.returncode == 0, empty.stderr
    assert "Queries: 0" in empty.stdout.decode()


def test_count_ngrams_dump_counts_roundtrip(tmp_path, spark):
    """count_ngrams/dump_counts twins: binary record format (order×u32 +
    u64, SuffixOrder) + NUL vocab list round-trip to the transcribed
    corpus_count_test.cc golden window counts."""
    import struct

    corpus = tmp_path / "corpus.txt"
    corpus.write_text(
        "looking on a little more loin\n"
        "on a little more loin\n"
        "on foo little more loin\n"
        "bar\n"
        "\n"
    )
    counts_bin = str(tmp_path / "counts.bin")
    vocab_bin = str(tmp_path / "vocab.bin")

    from kenlm_spark.count_ngrams_cli import main as cn_main

    assert cn_main(
        ["-o", "3", "--write_vocab_list", vocab_bin, "--text", str(corpus),
         "--out", counts_bin, "--master", "local[4]"]
    ) == 0

    # vocab list: specials first, then first-appearance order
    words = open(vocab_bin, "rb").read().decode().split("\x00")[:-1]
    assert words[:3] == ["<unk>", "<s>", "</s>"]
    assert words[3:] == ["looking", "on", "a", "little", "more", "loin",
                         "foo", "bar"]

    # SuffixOrder: reversed-id tuples must be sorted ascending
    raw = open(counts_bin, "rb").read()
    rec = struct.Struct("<3IQ")
    assert len(raw) % rec.size == 0
    recs = [rec.unpack_from(raw, i) for i in range(0, len(raw), rec.size)]
    rev = [tuple(reversed(r[:3])) for r in recs]
    assert rev == sorted(rev)

    from kenlm_spark.dump_counts_cli import main as dc_main

    old = sys.stdout
    sys.stdout = io.StringIO()
    try:
        assert dc_main([counts_bin, vocab_bin, "3"]) == 0
        dumped = sys.stdout.getvalue()
    finally:
        sys.stdout = old
    got = {}
    for line in dumped.splitlines():
        parts = line.split(" ")
        got[" ".join(parts[:3])] = int(parts[3])
    golden = {
        "<s> <s> looking": 1, "<s> looking on": 1, "looking on a": 1,
        "on a little": 2, "a little more": 2, "little more loin": 3,
        "more loin </s>": 3, "<s> <s> on": 2, "<s> on a": 1, "<s> on foo": 1,
        "on foo little": 1, "foo little more": 1, "<s> <s> bar": 1,
        "<s> bar </s>": 1, "<s> <s> </s>": 1,
    }
    assert got == golden


def test_interpolate_cli(tmp_path, spark):
    """interpolate twin: fixed-weight merge emits an ARPA our loader and
    the compiled reference both score; --just_tune prints the Newton
    weights from the ported tune_derivatives math."""
    a = os.path.join(FIX, "tune_a.arpa")
    b = os.path.join(FIX, "tune_b.arpa")
    out = str(tmp_path / "mix.arpa")

    from kenlm_spark.interpolate_cli import main as ip_main

    assert ip_main(["-m", a, b, "-w", "0.6", "0.4", "--arpa", out,
                    "--master", "local[4]"]) == 0

    from kenlm_spark.ngram.arpa import load_arpa

    mixed = load_arpa(out)
    ma, mb = load_arpa(a), load_arpa(b)
    # a unigram present in both models must mix as log10(0.6*pa + 0.4*pb)
    import math

    w = "the"
    pa = 10 ** ma.uni_prob[ma.vocab[w]]
    pb = 10 ** mb.uni_prob[mb.vocab[w]]
    assert float(mixed.uni_prob[mixed.vocab[w]]) == pytest.approx(
        math.log10(0.6 * pa + 0.4 * pb), abs=1e-5
    )
    if os.path.exists("/tmp/refbuild"):
        sys.path.insert(0, "/tmp/refbuild")
        try:
            import kenlm as ref_kenlm
        except ImportError:
            return
        ref = ref_kenlm.Model(out)
        for s in ["the table has rows", "executors run the shuffle"]:
            assert mixed.score(s) == pytest.approx(
                ref.score(s, bos=True, eos=True), abs=1e-4
            )


def test_interpolate_cli_just_tune(tmp_path):
    a = os.path.join(FIX, "tune_a.arpa")
    b = os.path.join(FIX, "tune_b.arpa")
    heldout = tmp_path / "heldout.txt"
    heldout.write_text(
        "the query joins the table rows\n"
        "executors run the shuffle quickly\n"
    )

    from kenlm_spark.interpolate_cli import main as ip_main

    old = sys.stdout
    sys.stdout = io.StringIO()
    try:
        assert ip_main(["-m", a, b, "-t", str(heldout), "--just_tune"]) == 0
        weights = [float(x) for x in sys.stdout.getvalue().split()]
    finally:
        sys.stdout = old
    assert len(weights) == 2 and all(abs(w) < 10 for w in weights)


def test_fragment_cli_matches_reference_binary(tmp_path):
    """fragment twin: RuleScore/ChartState fragment scores (no <s>/</s>)
    printed per line, differential vs the compiled reference's own
    `fragment` binary on probing AND rest-probing models."""
    if not os.path.isdir("/tmp/refbuild"):
        pytest.skip("compiled reference tree not present")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from diff_reference import ensure_fragment

    frag = ensure_fragment()
    text = "on a little more loin\nlooking on\nfoo bar zzz\nscreening\n"
    for model in ("test_probing.klm", "test_rest_probing.klm"):
        path = os.path.join(FIX, model)
        theirs = subprocess.run(
            [frag, path], input=text, capture_output=True, text=True,
        ).stdout.split()
        ours_p = subprocess.run(
            [sys.executable, "-m", "kenlm_spark.fragment_cli", path],
            input=text, capture_output=True, text=True,
        )
        ours = ours_p.stdout.split()
        assert len(ours) == len(theirs) == 4, ours_p.stderr
        for a, b in zip(ours, theirs):
            assert float(a) == pytest.approx(float(b), abs=2e-4), model


def test_phrase_table_vocab_cli(tmp_path):
    """phrase_table_vocab twin: per-sentence target vocab from a phrase
    table (source ||| target), sentences seeded with their own words,
    sub-phrase matching capped at 7 words."""
    src = tmp_path / "src.txt"
    src.write_text("the quick brown fox\nanother sentence here\n")
    table = (
        "quick brown ||| schnell braun ||| 0.5\n"
        "sentence here ||| satz hier\n"
        "missing phrase ||| nope\n"
        "the quick brown fox ||| full match\n"
    )
    from kenlm_spark.phrase_table_vocab_cli import main as pv_main

    old_in, old_out = sys.stdin, sys.stdout
    sys.stdin, sys.stdout = io.StringIO(table), io.StringIO()
    try:
        assert pv_main([str(src)]) == 0
        out = sys.stdout.getvalue()
    finally:
        sys.stdin, sys.stdout = old_in, old_out
    lines = out.splitlines()
    assert len(lines) == 2
    assert set(lines[0].split()) == {
        "the", "quick", "brown", "fox", "schnell", "braun", "full", "match",
    }
    assert set(lines[1].split()) == {
        "another", "sentence", "here", "satz", "hier",
    }


def test_lmplz_skip_symbols(tmp_path, spark):
    """corpus_count.cc disallowed-symbol parity: literal <s>/</s>/<unk>
    in the corpus is a format error by default; --skip_symbols treats
    them as whitespace (identical model to the cleaned corpus)."""
    from kenlm_spark.estimator import count_windows

    bad = spark.createDataFrame(
        [("hello <s> world",), ("fine line",)], "text string"
    )
    with pytest.raises(Exception, match="Special word"):
        count_windows(bad, "text", 2).collect()
    skipped = {
        tuple(r["words"]): r["count"]
        for r in count_windows(bad, "text", 2,
                               disallowed_symbol="skip").collect()
    }
    clean = spark.createDataFrame(
        [("hello world",), ("fine line",)], "text string"
    )
    expect = {
        tuple(r["words"]): r["count"]
        for r in count_windows(clean, "text", 2).collect()
    }
    assert skipped == expect


def test_cat_compressed_cli(tmp_path):
    """cat_compressed twin: gz/bz2/xz and plain files stream decompressed
    to stdout in argument order; no args reads stdin; -h prints usage."""
    import bz2 as _bz2
    import gzip as _gzip
    import lzma as _lzma

    payloads = [b"alpha beta\n", b"gamma\n", b"delta epsilon\n", b"zeta\n"]
    paths = []
    for name, data, opener in [
        ("a.gz", payloads[0], _gzip.open),
        ("b.bz2", payloads[1], _bz2.open),
        ("c.xz", payloads[2], _lzma.open),
    ]:
        p = tmp_path / name
        with opener(p, "wb") as fh:
            fh.write(data)
        paths.append(str(p))
    plain = tmp_path / "d.txt"
    plain.write_bytes(payloads[3])
    paths.append(str(plain))
    r = subprocess.run(
        [sys.executable, "-m", "kenlm_spark.cat_compressed_cli", *paths],
        capture_output=True,
    )
    assert r.returncode == 0
    assert r.stdout == b"".join(payloads)
    r = subprocess.run(
        [sys.executable, "-m", "kenlm_spark.cat_compressed_cli"],
        input=b"from stdin\n", capture_output=True,
    )
    assert r.stdout == b"from stdin\n"
    r = subprocess.run(
        [sys.executable, "-m", "kenlm_spark.cat_compressed_cli", "-h"],
        capture_output=True,
    )
    assert r.returncode == 1 and b"Usage" in r.stderr
