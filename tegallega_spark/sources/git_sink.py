"""Git-commit-as-sink (SURVEY K6 — direct-graphs-generation.yml:86-107,
.gitattributes:1-3).

The reference publishes generated GTFS artifacts by committing them to the
repo from CI: configure LFS tracking for gtfs/stop_times.txt, stage the
feed dir + otp-deploy/gtfs.zip, and commit only when something changed
("No GTFS changes to commit").  Here the same contract is a sink callable
from a pipeline, built on the git binary + pure stdlib:

- LFS needs no git-lfs binary: the pointer format (spec v1) and the object
  layout (.git/lfs/objects/<aa>/<bb>/<sha256>) are a public spec
  (git-lfs/docs/spec.md).  We store the real content in the object store,
  then stage the POINTER at the index level (hash-object + update-index
  --cacheinfo) while the work tree keeps the real file — exactly the state
  git-lfs's clean filter produces.
- The reference appends the tracking line to .gitattributes on every CI
  run (direct-graphs-generation.yml:89-91), so its committed .gitattributes
  accumulates the same line many times over.  That is a CI artifact, not a
  semantic: we write the line idempotently.
- Commit-if-changed mirrors yml:100-105: `git diff --cached --quiet` →
  skip with no error, else commit.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
from dataclasses import dataclass

_POINTER_VERSION = "https://git-lfs.github.com/spec/v1"


def _git(repo_dir: str, *args: str) -> str:
    out = subprocess.run(
        ["git", *args], cwd=repo_dir, check=True,
        capture_output=True, text=True,
    )
    return out.stdout.strip()


def ensure_repo(repo_dir: str) -> None:
    """Init (if needed) and pin the committer identity the reference CI
    uses (direct-graphs-generation.yml:97-99)."""
    os.makedirs(repo_dir, exist_ok=True)
    if not os.path.isdir(os.path.join(repo_dir, ".git")):
        _git(repo_dir, "init", "-q")
    _git(repo_dir, "config", "user.name", "GitHub Actions")
    _git(repo_dir, "config", "user.email", "actions@users.noreply.github.com")


# ---------------------------------------------------------------------------
# LFS pointer + object store (public spec, stdlib implementation)
# ---------------------------------------------------------------------------

@dataclass
class LfsPointer:
    oid: str
    size: int

    def text(self) -> str:
        # key order and trailing newline are mandated by the spec
        return (
            f"version {_POINTER_VERSION}\n"
            f"oid sha256:{self.oid}\n"
            f"size {self.size}\n"
        )


def lfs_object_path(repo_dir: str, oid: str) -> str:
    return os.path.join(repo_dir, ".git", "lfs", "objects", oid[:2], oid[2:4], oid)


def lfs_clean(repo_dir: str, path: str) -> LfsPointer:
    """git-lfs 'clean' filter: content → object store, return the pointer."""
    h = hashlib.sha256()
    size = 0
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
            size += len(chunk)
    oid = h.hexdigest()
    obj = lfs_object_path(repo_dir, oid)
    os.makedirs(os.path.dirname(obj), exist_ok=True)
    if not os.path.exists(obj):
        shutil.copyfile(path, obj)
    return LfsPointer(oid, size)


def parse_lfs_pointer(text: str) -> LfsPointer:
    fields = dict(
        line.split(" ", 1) for line in text.strip().splitlines() if " " in line
    )
    assert fields.get("version") == _POINTER_VERSION, "not an LFS pointer"
    return LfsPointer(fields["oid"].removeprefix("sha256:"), int(fields["size"]))


def lfs_smudge(repo_dir: str, pointer_text: str) -> bytes:
    """git-lfs 'smudge' filter: pointer → real content from the store."""
    ptr = parse_lfs_pointer(pointer_text)
    with open(lfs_object_path(repo_dir, ptr.oid), "rb") as f:
        data = f.read()
    assert len(data) == ptr.size and hashlib.sha256(data).hexdigest() == ptr.oid
    return data


def lfs_track(repo_dir: str, pattern: str) -> None:
    """Idempotent `git lfs track` (yml:89-91 appends unconditionally —
    see module docstring)."""
    line = f"{pattern} filter=lfs diff=lfs merge=lfs -text"
    attrs = os.path.join(repo_dir, ".gitattributes")
    existing = ""
    if os.path.exists(attrs):
        with open(attrs, encoding="utf-8") as f:
            existing = f.read()
    if line not in existing.splitlines():
        with open(attrs, "a", encoding="utf-8") as f:
            if existing and not existing.endswith("\n"):
                f.write("\n")
            f.write(line + "\n")


def _stage_lfs_pointer(repo_dir: str, rel_path: str) -> LfsPointer:
    """Stage rel_path as its LFS pointer (index only); work tree keeps the
    real content, object store gets a copy — the post-clean-filter state."""
    ptr = lfs_clean(repo_dir, os.path.join(repo_dir, rel_path))
    sha = subprocess.run(
        ["git", "hash-object", "-w", "--stdin"], cwd=repo_dir, check=True,
        input=ptr.text(), capture_output=True, text=True,
    ).stdout.strip()
    _git(repo_dir, "update-index", "--add",
         "--cacheinfo", f"100644,{sha},{rel_path}")
    return ptr


# ---------------------------------------------------------------------------
# The sink
# ---------------------------------------------------------------------------

def commit_artifacts(
    repo_dir: str,
    paths: list[str],
    message: str,
    lfs_patterns: list[str] = (),
) -> str | None:
    """Stage `paths` (repo-relative files or directories) and commit iff the
    staged tree differs from HEAD (yml:100-105).  Files matching an entry
    of `lfs_patterns` (exact repo-relative path or a fnmatch pattern) are
    committed as LFS pointers.  Returns the new commit sha, or None when
    there was nothing to commit ("No GTFS changes to commit")."""
    import fnmatch

    ensure_repo(repo_dir)
    for pat in lfs_patterns:
        lfs_track(repo_dir, pat)
    if lfs_patterns:
        _git(repo_dir, "add", ".gitattributes")

    def is_lfs(rel: str) -> bool:
        return any(rel == p or fnmatch.fnmatch(rel, p) for p in lfs_patterns)

    files: list[str] = []
    for p in paths:
        full = os.path.join(repo_dir, p)
        if os.path.isdir(full):
            for root, _, names in os.walk(full):
                for n in sorted(names):
                    files.append(os.path.relpath(os.path.join(root, n), repo_dir))
        else:
            files.append(p)
    for rel in sorted(files):
        if is_lfs(rel):
            _stage_lfs_pointer(repo_dir, rel)
        else:
            _git(repo_dir, "add", rel)

    changed = subprocess.run(
        ["git", "diff", "--cached", "--quiet"], cwd=repo_dir
    ).returncode != 0
    if not changed:
        return None
    _git(repo_dir, "commit", "-q", "-m", message)
    return _git(repo_dir, "rev-parse", "HEAD")


def publish_gtfs_feed(repo_dir: str, feed_dir: str = "gtfs") -> str | None:
    """The reference workflow end-to-end (yml:84-107): package
    {repo_dir}/{feed_dir}/*.txt into otp-deploy/gtfs.zip, track
    stop_times.txt through LFS, commit iff changed."""
    from tegallega_spark.sources.gtfs import make_gtfs_zip

    os.makedirs(os.path.join(repo_dir, "otp-deploy"), exist_ok=True)
    make_gtfs_zip(
        os.path.join(repo_dir, feed_dir),
        os.path.join(repo_dir, "otp-deploy", "gtfs.zip"),
    )
    return commit_artifacts(
        repo_dir,
        [feed_dir, "otp-deploy/gtfs.zip"],
        "Auto-generated GTFS feed and gtfs.zip",
        lfs_patterns=[f"{feed_dir}/stop_times.txt"],
    )
