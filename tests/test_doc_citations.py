"""Doc-citation integrity: every `docs/<doc>.md "<section>"` ref resolves.

Round-4 verdict item 8: twice (round-2 IVF, round-3 PQ) a module shipped
citing a PERFORMANCE.md section that did not exist yet. This test makes the
claim-check part of the default suite: any string of the form
``docs/<FILE>.md "<Section>"`` anywhere in the source, tools, tests, or docs
must point at an existing file that actually contains the quoted section
text. A citation written before its measurement section now fails CI instead
of shipping as prose.
"""
import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
SCAN_DIRS = ["anyloc_tpu", "tools", "tests", "docs", "examples"]
SCAN_FILES = ["README.md", "bench.py", "bench_retrieval.py",
              "__graft_entry__.py"]
CITE = re.compile(r'docs/([A-Za-z0-9_]+\.md)\s+"([^"\n]+)"')


def _iter_sources():
    for d in SCAN_DIRS:
        for p in sorted((ROOT / d).rglob("*")):
            if p.suffix in (".py", ".md") and "__pycache__" not in p.parts:
                yield p
    for f in SCAN_FILES:
        p = ROOT / f
        if p.exists():
            yield p


def _collect_citations():
    out = []
    for p in _iter_sources():
        text = p.read_text(errors="replace")
        for lineno, line in enumerate(text.splitlines(), 1):
            for m in CITE.finditer(line):
                out.append((p.relative_to(ROOT), lineno,
                            m.group(1), m.group(2)))
    return out


def test_every_doc_section_citation_resolves():
    cites = _collect_citations()
    assert cites, "citation scanner found nothing — regex or layout drift"
    missing = []
    for src, lineno, doc, section in cites:
        target = ROOT / "docs" / doc
        if not target.exists():
            missing.append(f"{src}:{lineno} -> docs/{doc} (file missing)")
        elif section not in target.read_text(errors="replace"):
            missing.append(
                f'{src}:{lineno} -> docs/{doc} "{section}" (section missing)')
    assert not missing, (
        "dangling doc citations (write the section before citing it):\n"
        + "\n".join(missing))


def test_readme_test_count_is_current():
    """The README's advertised test count must match the collected suite
    (±10 so the line needn't churn every single test, but can never again
    drift by a round's worth of work)."""
    readme = (ROOT / "README.md").read_text()
    m = re.search(r"tests/\s+(\d+)\s+tests", readme)
    assert m, "README no longer states a test count"
    stated = int(m.group(1))
    import subprocess
    import sys

    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # never grab the real chip for a collect
    env.pop("PYTEST_ADDOPTS", None)  # a shell -k filter would skew the count
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--collect-only",
         "-p", "no:cacheprovider"],
        capture_output=True, text=True, cwd=ROOT, env=env,
    )
    m2 = re.search(r"(\d+) tests collected", proc.stdout)
    if m2 is None:
        pytest.skip(f"collect-only failed under nested pytest: "
                    f"{proc.stdout[-200:]}")
    collected = int(m2.group(1))
    assert abs(collected - stated) <= 10, (
        f"README says {stated} tests; suite collects {collected} — "
        f"update README.md")


def test_no_placeholder_tokens_in_doc_tables():
    """Round-5 guard for the ship-the-format-first disease (rounds 2-4): a
    measurement table must never contain an unfilled ALL-CAPS template token
    (e.g. ``PQ_10M_QB256``) — a table row is claimed-measured the moment it
    is committed. Scans every markdown table row in docs/ + README."""
    placeholder = re.compile(r"\b[A-Z][A-Z0-9]*(?:_[A-Z0-9]+){1,}\b")
    # legitimate ALL-CAPS_WITH_UNDERSCORE strings that appear in tables
    allowed = {
        "ANYLOC_TPU_LANE", "XLA_FLAGS", "JAX_PLATFORMS",
        "LIBTPU_INIT_ARGS", "HF_HOME", "TORCH_HOME", "CUDA_VISIBLE_DEVICES",
        "JAX_COMPILATION_CACHE_DIR", "PYTHONPATH", "LD_LIBRARY_PATH",
        "READ_ONLY", "N_A",
    }
    offenders = []
    docs = sorted((ROOT / "docs").glob("*.md")) + [ROOT / "README.md"]
    for p in docs:
        for lineno, line in enumerate(
                p.read_text(errors="replace").splitlines(), 1):
            s = line.strip()
            if not (s.startswith("|") and s.endswith("|")):
                continue  # only table rows make measurement claims
            for tok in placeholder.findall(s):
                if tok in allowed or "`" + tok in line or tok + "`" in line:
                    continue  # code-formatted tokens are identifiers, not
                    # unfilled cells (env vars, flag names)
                offenders.append(f"{p.relative_to(ROOT)}:{lineno}: {tok}")
    assert not offenders, (
        "unfilled placeholder tokens in measurement tables "
        "(fill the cell with the measured number before committing):\n"
        + "\n".join(offenders))
