"""Repo-side leak probes: no internal-tooling or non-public references.

The per-round driver runs its own LEAKCHECK probe set (imports, URLs,
buckets, keys).  Round 6 showed that set does not cover session-tooling
references inside comments (a "see .claude verify notes" comment slipped
through), so this test extends the probe set in-repo: every pattern here
must have zero hits in the shipped package and its tests.  Everything in
the package must derive from public knowledge only — PySpark APIs, the
reference repo's observable behavior, and published papers.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# Directories that ship as the engine + its tests.  Round artifacts
# (VERDICT.md, ADVICE.md, *.json) are judge/driver-authored and may quote
# the very strings we are probing for, so they are out of scope.
SCAN_DIRS = ["hbacker_spark", "tests"]
SCAN_ROOT_FILES = [
    "__spark_entry__.py",
    "bench.py",
    "plan_audit.py",
    "ann_recall_smoke.py",
    "skew_smoke.py",
    "scale_smoke_gen.py",
    "README.md",
    "DESIGN.md",
    "COVERAGE.md",
    "SCALE_NOTES.md",
    "MIGRATION.md",
    "FIXTURES.md",
]

# Each probe: (name, compiled regex).  Patterns target internal-tooling
# and proprietary-system references that must never appear in a
# public-knowledge-only repo.
PROBES = [
    ("claude-session-tooling", re.compile(r"\.claude|claude[ _-]?code", re.I)),
    ("internal-verify-notes", re.compile(r"verify notes|session notes|internal notes", re.I)),
    ("slack-link", re.compile(r"slack\.com|#[a-z0-9-]*-(eng|infra|oncall)\b", re.I)),
    ("go-shortlink", re.compile(r"\bgo/[a-z][a-z0-9-]{2,}\b")),
    ("internal-host", re.compile(r"\.corp\.|\.internal\.[a-z]+[/\"']", re.I)),
    ("api-key", re.compile(r"(api[_-]?key|secret[_-]?key)\s*[:=]\s*['\"][A-Za-z0-9]{12,}")),
    ("aws-key-id", re.compile(r"\bAKIA[0-9A-Z]{16}\b")),
]

# This file necessarily contains the probe strings themselves.
SELF = Path(__file__).resolve()


def _iter_files():
    for d in SCAN_DIRS:
        root = REPO / d
        for p in sorted(root.rglob("*")):
            if p.is_file() and p.suffix in {".py", ".md", ".sql", ".txt"}:
                yield p
    for f in SCAN_ROOT_FILES:
        p = REPO / f
        if p.is_file():
            yield p


def test_no_internal_tooling_references():
    hits = []
    for path in _iter_files():
        if path == SELF or "__pycache__" in path.parts:
            continue
        text = path.read_text(errors="replace")
        for lineno, line in enumerate(text.splitlines(), 1):
            for name, rx in PROBES:
                if rx.search(line):
                    hits.append(f"{path.relative_to(REPO)}:{lineno} [{name}] {line.strip()[:120]}")
    assert not hits, "internal-tooling/leak probe hits:\n" + "\n".join(hits)
