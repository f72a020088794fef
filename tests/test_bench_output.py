"""bench.py output contract (VERDICT r4 items 1+8b): the headline JSON line
must be emitted the moment the surrogate number exists, and a failure in any
later phase must never erase it. Round 4 lost its perf number because the
old bench only printed after ALL phases finished and one hung."""

import io
import json


def _lines(buf):
    return [json.loads(ln) for ln in buf.getvalue().splitlines() if ln]


def _headline():
    return {"metric": "m", "value": 1.5, "unit": "MP/s", "vs_baseline": 0.3,
            "extra": {"surrogate_timing_spread": 0.0}}


def test_headline_emitted_before_coding_runs():
    import bench

    buf = io.StringIO()
    seen = []

    def coding():
        # the headline must already be on the wire when coding starts
        seen.append(_lines(buf))
        return {"ztsep_coding_s_per_img": 2.0}

    bench.run_bench(_headline, coding, out=buf)
    assert len(seen[0]) == 1 and seen[0][0]["value"] == 1.5
    lines = _lines(buf)
    assert len(lines) == 2
    assert lines[1]["extra"]["ztsep_coding_s_per_img"] == 2.0
    assert lines[1]["value"] == 1.5


def test_coding_failure_keeps_headline():
    import bench

    buf = io.StringIO()

    def coding():
        raise RuntimeError("tunnel went down")

    merged = bench.run_bench(_headline, coding, out=buf)
    lines = _lines(buf)
    assert len(lines) == 2
    assert lines[0]["value"] == 1.5  # headline intact
    assert "tunnel went down" in lines[1]["extra"]["coding_error"]
    assert merged["value"] == 1.5


def test_surrogate_failure_emits_nothing_but_raises():
    # if even the surrogate fails there is nothing to emit — the driver
    # sees a nonzero rc, not a half-written line
    import bench

    buf = io.StringIO()

    def bad():
        raise RuntimeError("no backend")

    try:
        bench.run_bench(bad, lambda: {}, out=buf)
    except RuntimeError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected surrogate failure to propagate")
    assert buf.getvalue() == ""
