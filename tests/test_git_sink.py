"""K6 git-commit-as-sink (direct-graphs-generation.yml:86-107): commit
created with LFS pointer for stop_times.txt, object-store round trip,
idempotent tracking line, and the no-change skip path."""

from __future__ import annotations

import hashlib
import os
import subprocess
import zipfile

import pytest

from tegallega_spark.sources.git_sink import (
    commit_artifacts,
    lfs_object_path,
    lfs_smudge,
    parse_lfs_pointer,
    publish_gtfs_feed,
)

STOP_TIMES = b"trip_id,arrival_time,departure_time,stop_id,stop_sequence\nT1,06:00:00,06:00:00,S1,1\n"
AGENCY = b"agency_id,agency_name\nA1,Tegallega\n"


@pytest.fixture()
def repo(tmp_path):
    repo_dir = str(tmp_path / "pub")
    feed = os.path.join(repo_dir, "gtfs")
    os.makedirs(feed)
    with open(os.path.join(feed, "stop_times.txt"), "wb") as f:
        f.write(STOP_TIMES)
    with open(os.path.join(feed, "agency.txt"), "wb") as f:
        f.write(AGENCY)
    return repo_dir


def git_show(repo_dir, spec):
    return subprocess.run(
        ["git", "show", spec], cwd=repo_dir, check=True, capture_output=True
    ).stdout


def test_publish_commits_with_lfs_pointer(repo):
    sha = publish_gtfs_feed(repo)
    assert sha is not None
    # committed stop_times.txt is a spec-v1 pointer, not the CSV
    blob = git_show(repo, "HEAD:gtfs/stop_times.txt").decode()
    ptr = parse_lfs_pointer(blob)
    assert ptr.oid == hashlib.sha256(STOP_TIMES).hexdigest()
    assert ptr.size == len(STOP_TIMES)
    # non-tracked table committed verbatim
    assert git_show(repo, "HEAD:gtfs/agency.txt") == AGENCY
    # object store holds the real bytes at the spec layout
    with open(lfs_object_path(repo, ptr.oid), "rb") as f:
        assert f.read() == STOP_TIMES
    # work tree still has the real content (post-clean-filter state)
    with open(os.path.join(repo, "gtfs", "stop_times.txt"), "rb") as f:
        assert f.read() == STOP_TIMES
    # smudge round-trips
    assert lfs_smudge(repo, blob) == STOP_TIMES
    # the zip is committed and contains both tables flat
    with zipfile.ZipFile(os.path.join(repo, "otp-deploy", "gtfs.zip")) as z:
        assert sorted(z.namelist()) == ["agency.txt", "stop_times.txt"]


def test_no_change_skips_commit(repo):
    first = publish_gtfs_feed(repo)
    again = publish_gtfs_feed(repo)
    assert first is not None and again is None
    log = subprocess.run(
        ["git", "rev-list", "--count", "HEAD"], cwd=repo,
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    assert log == "1"


def test_change_creates_second_commit(repo):
    first = publish_gtfs_feed(repo)
    with open(os.path.join(repo, "gtfs", "stop_times.txt"), "ab") as f:
        f.write(b"T1,06:05:00,06:05:00,S2,2\n")
    second = publish_gtfs_feed(repo)
    assert first and second and first != second
    new_ptr = parse_lfs_pointer(git_show(repo, "HEAD:gtfs/stop_times.txt").decode())
    old_ptr = parse_lfs_pointer(git_show(repo, "HEAD~1:gtfs/stop_times.txt").decode())
    assert new_ptr.oid != old_ptr.oid
    # both generations remain materializable from the object store
    assert lfs_smudge(repo, git_show(repo, "HEAD~1:gtfs/stop_times.txt").decode()) == STOP_TIMES


def test_tracking_line_written_once(repo):
    publish_gtfs_feed(repo)
    with open(os.path.join(repo, "gtfs", "agency.txt"), "ab") as f:
        f.write(b"A2,Second\n")
    publish_gtfs_feed(repo)
    with open(os.path.join(repo, ".gitattributes")) as f:
        lines = [l for l in f.read().splitlines() if "stop_times" in l]
    # reference CI appends the line per run (yml:89-91) — ours is idempotent
    assert lines == ["gtfs/stop_times.txt filter=lfs diff=lfs merge=lfs -text"]


def test_commit_artifacts_glob_pattern(tmp_path):
    repo_dir = str(tmp_path / "glob")
    os.makedirs(os.path.join(repo_dir, "data"))
    for name, body in [("a.bin", b"\x00" * 64), ("b.bin", b"\x01" * 64), ("meta.txt", b"x\n")]:
        with open(os.path.join(repo_dir, "data", name), "wb") as f:
            f.write(body)
    sha = commit_artifacts(repo_dir, ["data"], "add data", lfs_patterns=["data/*.bin"])
    assert sha is not None
    for name in ("a.bin", "b.bin"):
        parse_lfs_pointer(git_show(repo_dir, f"HEAD:data/{name}").decode())
    assert git_show(repo_dir, "HEAD:data/meta.txt") == b"x\n"
