"""CLI twin of the reference's `kenlm_benchmark` (lm/kenlm_benchmark_main.cc)
— the reference's OWN throughput-metric harness, so this repo's
queries-per-second numbers can be produced under the reference's metric
definition (id-stream protocol, load time excluded).

Protocol (lm/kenlm_benchmark_main.cc:17-31, 80-132):

    # convert text to vocab ids offline (ids are tied to a model);
    # width = 1/2/4/8 bytes by vocabulary bound
    python -m kenlm_spark.benchmark_cli -v -m model.klm <text >text.vocab
    # timed query from vocab ids; per-sentence state starts at
    # BeginSentence, EOS resets it; every id (EOS included) is one query
    python -m kenlm_spark.benchmark_cli -q -m model.klm <text.vocab

The -v stream is byte-identical to the reference's (same ids, same
width rule, EOS appended per line). The -q report prints the same lines
the reference prints (Threads / To Load / Probability sum / Queries /
Excluding load / Seconds per query / Queries per second / RSSMax), with
the probability sum matching the compiled reference binding's FullScore
sum over the same stream (tests/test_cli.py). The reference binary
itself needs boost to build, which this container lacks — the
differential leg therefore pins -v bytes and -q sums against the
compiled python binding instead (same precedent as filter_cli).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# process-start anchor: the reference's "To Load ... Wall:" is elapsed
# wall since program start (util::UsageStats); perf_counter()'s absolute
# value is an arbitrary epoch, so anchor at module import
_PROC_T0 = time.perf_counter()

# fork-inherited state for the -t worker pool: the loaded model's numpy
# arrays are shared copy-on-write with the children, mirroring the
# reference's threads sharing one mmapped model
# (lm/kenlm_benchmark_main.cc:199-204 spawns boost threads over a
# producer/consumer buffer queue; chunked sentence ranges are the
# process-pool analogue)
_FORK_STATE: dict = {}


# ~512k tokens per score_batch call: the flat per-order searchsorted
# arrays stay cache-resident (one 5.5M-token mega-batch measured 1.9x
# slower than the same stream in 512k slices)
_BATCH_TOKENS = int(os.environ.get("KENLM_SPARK_BATCH_TOKENS", 1 << 19))


def _score_stream(model, ids: np.ndarray) -> float:
    """Sum of sentence log10 probs over an EOS-delimited id stream.

    The compiled kernel walks the stream sequentially, so one call over
    the whole slice is optimal; the numpy fallback's per-order sweeps
    fall out of cache on mega-batches (measured 1.9x), so without the
    native kernel the stream is cut into sentence-aligned
    ~_BATCH_TOKENS slices first."""
    if model._native() is not None:
        return model.score_id_stream_total(ids)
    if len(ids) <= _BATCH_TOKENS:
        s, _, _ = model.score_id_stream(ids)
        return float(np.sum(s))
    eos_pos = np.flatnonzero(ids == model.eos_id)
    total, j = 0.0, 0
    while j < len(ids):
        cut = len(ids)
        if j + _BATCH_TOKENS < len(ids):
            nxt = int(np.searchsorted(eos_pos, j + _BATCH_TOKENS))
            if nxt < len(eos_pos):
                cut = int(eos_pos[nxt]) + 1
        s, _, _ = model.score_id_stream(ids[j:cut])
        total += float(np.sum(s))
        j = cut
    return total


def _score_chunk(idx: int) -> float:
    lo, hi = _FORK_STATE["cuts"][idx], _FORK_STATE["cuts"][idx + 1]
    return _score_stream(_FORK_STATE["model"], _FORK_STATE["ids"][lo:hi])


def _width(bound: int) -> str:
    if bound <= 256:
        return "u1"
    if bound <= 65536:
        return "<u2"
    if bound <= 1 << 32:
        return "<u4"
    return "<u8"


def convert_to_bytes(model, fin, fout) -> None:
    dt = np.dtype(_width(model.vocab_size))
    eos = model.eos_id
    for line in fin:
        ids = [model.word_id(w) for w in line.split()]
        ids.append(eos)
        fout.write(np.asarray(ids, dtype=dt).tobytes())


def query_from_bytes(model, fin, fout, ferr, threads: int = 1) -> dict:
    load_wall = time.perf_counter() - _PROC_T0
    fout.write(f"Threads: {max(threads, 1)}\n")
    fout.write(f"To Load, CPU: {time.process_time():.6g} "
               f"Wall: {load_wall:.6g}\n")
    data = fin.read()
    dt = np.dtype(_width(model.vocab_size))
    ids = np.frombuffer(data, dtype=dt).astype(np.int64)
    queries = int(len(ids))
    # EOS markers delimit sentences and are themselves scored queries;
    # the whole split/flat-build now happens INSIDE the timed region
    # (vectorized in score_id_stream — the reference's -q likewise
    # times everything after load), where the pre-r6 code excluded a
    # per-sentence Python split loop from the timer.
    eos_pos = np.flatnonzero(ids == model.eos_id)
    n_workers = min(max(threads, 1), max(len(eos_pos), 1))
    t_os0 = os.times()
    t0_cpu, t0 = time.process_time(), time.perf_counter()
    if n_workers <= 1:
        total = _score_stream(model, ids)
    else:
        # -t path: fork pool over contiguous sentence-aligned stream
        # ranges; the model arrays are inherited copy-on-write (one
        # resident copy, like the reference's threads over one mmap)
        # and each range returns only its probability sum
        import multiprocessing as mp

        bounds = np.linspace(0, len(eos_pos), n_workers + 1).astype(int)
        cuts = [0] + [int(eos_pos[b - 1]) + 1 for b in bounds[1:-1]] + [
            len(ids)
        ]
        _FORK_STATE.update(model=model, ids=ids, cuts=cuts)
        try:
            with mp.get_context("fork").Pool(n_workers) as pool:
                total = float(sum(pool.map(_score_chunk, range(n_workers))))
        finally:
            _FORK_STATE.clear()
    t_os1 = os.times()
    cpu = time.process_time() - t0_cpu
    if n_workers > 1:
        # children's CPU isn't in process_time(); os.times() tracks it
        cpu += (t_os1.children_user - t_os0.children_user) + (
            t_os1.children_system - t_os0.children_system
        )
    wall = time.perf_counter() - t0
    # guards: an empty id stream (queries=0) or a sub-timer-resolution
    # run must report degenerate rates, not raise ZeroDivisionError
    eps = 1e-9
    q_div = max(queries, 1)
    cpu_div = max(cpu, eps)
    wall_div = max(wall, eps)
    print(f"Probability sum: {total:.6g}", file=ferr)
    fout.write(f"Queries: {queries}\n")
    fout.write(f"Excluding load, CPU: {cpu:.6g} Wall: {wall:.6g}\n")
    fout.write(
        f"Seconds per query excluding load, CPU: {cpu / q_div:.6g} "
        f"Wall: {wall / q_div:.6g}\n"
    )
    fout.write(
        f"Queries per second excluding load, CPU: {queries / cpu_div:.6g} "
        f"Wall: {queries / wall_div:.6g}\n"
    )
    try:
        import resource

        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    except ImportError:  # pragma: no cover
        rss = 0
    fout.write(f"RSSMax: {rss}\n")
    return {
        "queries": queries,
        "probability_sum": total,
        "wall_excluding_load": wall,
        "queries_per_sec_wall": queries / wall_div,
    }


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    model_path = None
    vocab = query = False
    threads = 1
    i = 0
    while i < len(args):
        a = args[i]
        if a in ("-m", "--model"):
            model_path = args[i + 1]
            i += 2
        elif a in ("-v", "--vocab"):
            vocab = True
            i += 1
        elif a in ("-q", "--query"):
            query = True
            i += 1
        elif a in ("-t", "--threads"):
            threads = int(args[i + 1])
            i += 2
        elif a in ("-b", "--buffer"):
            i += 2  # accepted for flag parity; pool chunks are per-range
        else:
            print(f"unknown argument {a}", file=sys.stderr)
            return 1
    if model_path is None or vocab == query:
        print(
            "usage: benchmark_cli (-v | -q) -m MODEL  "
            "(-v: text stdin -> id bytes stdout; -q: id bytes stdin -> "
            "timing report)",
            file=sys.stderr,
        )
        return 0 if model_path is None else 1

    from kenlm_spark.ngram.binary import load_model

    model = load_model(model_path)
    if vocab:
        convert_to_bytes(model, sys.stdin, sys.stdout.buffer)
    else:
        query_from_bytes(
            model, sys.stdin.buffer, sys.stdout, sys.stderr, threads=threads
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
