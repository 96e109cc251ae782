"""Property-based test (hypothesis) of the version-pointer publish
protocol (`sinks.overwrite_table_versioned` / `read_table_versioned` /
the versioned branch of `compact_table`).

The protocol's safety claim is about CRASH POINTS, not about Spark:
whatever interleaving of successful refreshes and crashes (during the
version write, or between the completed write and the pointer flip)
occurs, a reader resolving the pointer must always land on the most
recently PUBLISHED complete version — never a partial dir, never a
crash orphan, and (with keep_previous) the predecessor must survive
exactly one further publish. So we fuzz the protocol with a fake
DataFrame whose writer just drops a payload + completeness marker on
disk: every step of the real function runs (version numbering, tmp
pointer, os.replace flip, retention sweep) in microseconds, letting
hypothesis explore hundreds of histories a Spark-backed test could
never afford."""

from __future__ import annotations

import os
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from copenhagen_traffic_and_weather_etl_pipeline_spark import sinks


class _FakeWriter:
    """Stands in for DataFrame.write: save() materializes a payload file
    plus a _COMPLETE marker, or crashes partway (payload written, no
    marker) to model a mid-write failure."""

    def __init__(self, payload: str, crash_mid_write: bool):
        self.payload = payload
        self.crash_mid_write = crash_mid_write

    def mode(self, _m):
        return self

    def format(self, _f):
        return self

    def save(self, path: str):
        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        (p / "part-00000.parquet").write_text(self.payload)
        if self.crash_mid_write:
            raise RuntimeError("simulated crash during version write")
        (p / "_COMPLETE").write_text(self.payload)


class _FakeDF:
    def __init__(self, payload: str, crash_mid_write: bool = False):
        self.write = _FakeWriter(payload, crash_mid_write)


def _read_published(path: str) -> str:
    """A reader: resolve the pointer exactly like read_table_versioned,
    then require the resolved dir to be COMPLETE and return its payload."""
    pointer = Path(path) / sinks._CURRENT_POINTER
    version = pointer.read_text().strip()
    vdir = Path(path) / version
    assert vdir.is_dir(), f"pointer names missing dir {version}"
    marker = vdir / "_COMPLETE"
    assert marker.exists(), f"pointer names incomplete dir {version}"
    return marker.read_text()


# Each op: ("ok" | "crash_write" | "crash_flip", payload)
_op = st.tuples(
    st.sampled_from(["ok", "crash_write", "crash_flip"]),
    st.integers(min_value=0, max_value=99),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_op, min_size=1, max_size=8))
def test_pointer_always_resolves_last_published_complete_version(tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("vt") / "table")
    published: list[str] = []  # payloads in publish order

    real_replace = os.replace
    for kind, n in ops:
        payload = f"payload-{n}"
        if kind == "ok":
            sinks.overwrite_table_versioned(_FakeDF(payload), path)
            published.append(payload)
        elif kind == "crash_write":
            with pytest.raises(RuntimeError, match="simulated crash"):
                sinks.overwrite_table_versioned(_FakeDF(payload, True), path)
        else:  # crash_flip: version write completes, pointer flip crashes
            def crashing_replace(src, dst, *a, **kw):
                raise RuntimeError("simulated crash at pointer flip")

            os.replace = crashing_replace
            try:
                with pytest.raises(RuntimeError, match="pointer flip"):
                    sinks.overwrite_table_versioned(_FakeDF(payload), path)
            finally:
                os.replace = real_replace

        # Invariant after EVERY op: if anything was ever published, a
        # reader resolves exactly the latest published payload.
        if published:
            assert _read_published(path) == published[-1]

    # Retention after the dust settles. Orphans (partial dirs from
    # crash_write, complete-but-unpointed dirs from crash_flip, stale
    # tmp pointer files) are swept by the NEXT successful publish — so
    # only ops AFTER the last success can leave debris. Bound the
    # surviving layout exactly by that tail:
    if published:
        last_ok = max(i for i, (k, _) in enumerate(ops) if k == "ok")
        tail = [k for k, _ in ops[last_ok + 1 :]]
        root = Path(path)
        dirs = [d for d in root.iterdir() if d.is_dir() and d.name.startswith("v_")]
        incomplete = [d for d in dirs if not (d / "_COMPLETE").exists()]
        # partial dirs: one per trailing crash_write, nothing older.
        assert len(incomplete) == tail.count("crash_write")
        # current + kept previous + one dir per trailing crash (of
        # either kind — crash_flip's completed dir also lingers).
        assert len(dirs) <= 2 + len(tail)
        # stale tmp pointer files: only trailing crash_flips leave one.
        tmps = list(root.glob(f"{sinks._CURRENT_POINTER}.tmp.*"))
        assert len(tmps) == tail.count("crash_flip")
