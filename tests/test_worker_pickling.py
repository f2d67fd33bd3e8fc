"""Worker-side functions must ship BY VALUE (self-contained cloudpickle).

Python workers do not have this package importable: the grading driver
may run from its own cwd, and a real cluster's executors only see the
package if someone remembered --py-files. Any pandas_udf / mapInPandas
function that cloudpickle serializes by module reference (importable
module-level def) raises ModuleNotFoundError on such workers — observed
exactly that when driving ``__spark_entry__`` from a non-repo cwd.

These tests round-trip every worker-executed helper through cloudpickle
in a subprocess whose sys.path CANNOT import the package, proving the
pickle carries the code itself. (The full-plan integration check is the
driver sim run from a non-repo cwd — see .claude/skills/verify.)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile


def _roundtrip_in_clean_process(fn, call_src: str) -> None:
    """cloudpickle.dumps(fn) here; load + exercise it in a subprocess
    with cwd=/ and the repo stripped from sys.path/PYTHONPATH."""
    import cloudpickle

    blob = cloudpickle.dumps(fn)
    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        f.write(blob)
        path = f.name
    try:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        prog = (
            "import sys\n"
            f"sys.path = [p for p in sys.path if not p.startswith({repo!r})]\n"
            "import pickle\n"
            f"fn = pickle.loads(open({path!r}, 'rb').read())\n" + call_src
        )
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        res = subprocess.run(
            [sys.executable, "-c", prog],
            cwd="/",
            env=env,
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert res.returncode == 0, f"worker-sim failed:\n{res.stderr}"
    finally:
        os.unlink(path)


def test_dot_q_batch_ships_by_value():
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.similarity import _dot_q_batch

    assert "<locals>" in _dot_q_batch.__qualname__
    _roundtrip_in_clean_process(
        _dot_q_batch,
        "import pandas as pd\n"
        "out = fn(pd.Series([[1, 2], [3, 4]]), pd.Series([[5, 6], [7, 8]]))\n"
        "assert out.tolist() == [17, 53], out\n",
    )


def test_assign_cells_ships_by_value():
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.clustering import _assign_cells

    assert "<locals>" in _assign_cells.__qualname__
    _roundtrip_in_clean_process(
        _assign_cells,
        "import numpy as np\n"
        "out = fn(np.array([[1, 0], [0, 1]]), np.array([[2, 0], [0, 2]]))\n"
        "assert out.tolist() == [0, 1], out\n",
    )


def test_decode_payload_ships_by_value():
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import _decode_payload

    assert "<locals>" in _decode_payload.__qualname__
    _roundtrip_in_clean_process(
        _decode_payload,
        "assert fn(b'abcd', 'text', True) == "
        "((97 + 98 + 99 + 100) // 4, int.from_bytes(b'abcd', 'big'))\n",
    )


def test_multimodal_extract_closure_ships_by_value():
    """The closure extract_features passes to mapInPandas references
    _decode_payload; with the by-value factory this whole chain must
    round-trip without the package importable."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import _decode_payload

    def extract_like(payloads):
        return [_decode_payload(p, "text", True) for p in payloads]

    _roundtrip_in_clean_process(
        extract_like,
        "out = fn([b'ab', b''])\n"
        "assert out == [((97 + 98) // 2, int.from_bytes(b'ab'.ljust(4, b'\\0'), "
        "'big')), (0, 0)], out\n",
    )


def test_probe_payload_ships_by_value():
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import _probe_payload

    assert "<locals>" in _probe_payload.__qualname__
    _roundtrip_in_clean_process(
        _probe_payload,
        "meta = fn(b'GIF89a' + bytes([7, 0, 3, 0]))\n"
        "assert meta == ('gif', 7, 3, None, None), meta\n",
    )


def test_synth_media_builder_ships_by_value():
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import _make_synth_media

    build = _make_synth_media()
    assert "<locals>" in build.__qualname__
    _roundtrip_in_clean_process(
        build,
        "kind, payload = fn(4)\n"
        "assert kind == 'image' and payload[:2] == b'BM', (kind, payload[:4])\n",
    )


def test_lake_stream_source_class_ships_by_value(tmp_path):
    """The Spark 4 Python DataSource class (and every helper it closes
    over) must unpickle in a process that cannot import the package —
    Spark's python runner/worker processes are exactly that. A
    module-level helper captured by the factory class would pickle as a
    module reference and die at unpickle (a real r7 regression, caught
    only by the /tmp driver run). Exercises the executor-side read()
    end-to-end on a real parquet file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import make_lake_stream_source

    cls = make_lake_stream_source()
    assert "<locals>" in cls.__qualname__
    pfile = str(tmp_path / "part.parquet")
    pq.write_table(pa.table({"k": [1, 2], "v": [10, 20]}), pfile)

    # ship the class + a tiny driver that instantiates the reader and
    # runs read() on a partition (pyarrow-only executor path)
    def probe():
        import types

        def field(n, t):
            return types.SimpleNamespace(
                name=n, dataType=types.SimpleNamespace(simpleString=lambda t=t: t)
            )

        src = cls(options={"mode": "cdc"})
        schema = types.SimpleNamespace(
            fieldNames=lambda: ["k", "v", "_change_type", "_commit_version"],
            fields=[
                field("k", "bigint"),
                field("v", "bigint"),
                field("_change_type", "string"),
                field("_commit_version", "bigint"),
            ],
        )
        reader = src.streamReader(schema)
        # the plan shape partitions() ships: (logical, alias chain,
        # partition constant, absent_ok) per stream field
        part = types.SimpleNamespace(
            path=pfile,
            colspec=(("k", ("k",), None, False), ("v", ("v",), None, False)),
            allowed=frozenset({"k", "v"}),
            change_type="insert",
            version=7,
        )
        rows = list(reader.read(part))
        assert rows == [(1, 10, "insert", 7), (2, 20, "insert", 7)], rows
        return "ok"

    _roundtrip_in_clean_process(probe, "assert fn() == 'ok'\n")
