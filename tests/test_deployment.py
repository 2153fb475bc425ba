"""North-rule deployment form: the engine ships to executors as a
--py-files zip via spark-submit, with NO repo checkout on sys.path
(the job runs from a neutral cwd). Exercises tools/package.py +
jobs/run_er_pipeline.py end-to-end, including checkpoint resume."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_pipeline(tmp_path):
    sys.path.insert(0, REPO)
    from tools.package import build

    zip_path = build(REPO)
    assert os.path.exists(zip_path)

    work = str(tmp_path / "work")
    cmd = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "run_er_pipeline.py"),
        "--synthetic", "150", "--work-dir", work,
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only code source
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    assert r["pages"] > 150 and r["clusters"] > 0

    # resume: second submit reuses every checkpointed stage
    out2 = subprocess.run(
        cmd + ["--resume"], capture_output=True, text=True, cwd=str(tmp_path),
        env=env, timeout=300,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    r2 = json.loads([l for l in out2.stdout.splitlines() if l.startswith("{")][-1])
    assert r2["pages"] == r["pages"] and r2["clusters"] == r["clusters"]


def test_job_wet_input(tmp_path):
    """--input-wet drives the full pipeline from WET text-extract
    segments (html is null: title key disabled, host/path/band keys
    block)."""
    sys.path.insert(0, REPO)
    from aml_entity_resolution_assignment_spark.sources import warc as W

    d = tmp_path / "wet"
    d.mkdir()
    rows = []
    for i in range(24):
        # two spellings of the same page text per entity -> dup pairs
        eid = i // 2
        rows.append(
            {
                "url": f"https://site{eid}.example.com/page?v={i % 2}",
                "warc_ts": f"2024-03-01T12:{i:02d}:00Z",
                "text": f"entity {eid} body text shared tokens alpha beta",
                "lang": "en",
            }
        )
    (d / "seg-0.wet.gz").write_bytes(W.write_wet(rows))

    work = str(tmp_path / "work")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "run_er_pipeline.py"),
            "--input-wet", str(d), "--work-dir", work,
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    r = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert r["pages"] == 24 and r["clusters"] > 0
