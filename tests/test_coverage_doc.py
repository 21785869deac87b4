"""COVERAGE.md drift guard (VERDICT r4 #10).

Every backticked dotted path in COVERAGE.md whose first component is a
``pcl_tpu`` submodule must resolve to an importable module or attribute.
This keeps the coverage document honest: a claim like ``ml.svm_train_dual``
fails here the moment the symbol stops being importable from the package.
"""

from __future__ import annotations

import importlib
import pathlib
import re

import pytest

import pcl_tpu

ROOT = pathlib.Path(__file__).resolve().parent.parent
DOC = ROOT / "COVERAGE.md"

# Top-level submodules of pcl_tpu — only tokens rooted here are claims.
_SUBMODULES = {
    p.name if p.is_dir() else p.stem
    for p in (ROOT / "pcl_tpu").iterdir()
    if (p.is_dir() and (p / "__init__.py").exists()) or p.suffix == ".py"
}
_SUBMODULES.discard("__init__")

_TOKEN_RE = re.compile(r"`([^`]+)`")
_DOTTED_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)+$")


def _resolve(path: str) -> bool:
    """Resolve ``a.b.c`` as module pcl_tpu.a[.b...] then getattr chain."""
    parts = path.split(".")
    # Longest importable module prefix, then attributes.
    for split in range(len(parts), 0, -1):
        modname = "pcl_tpu." + ".".join(parts[:split])
        try:
            obj = importlib.import_module(modname)
        except ImportError:
            continue
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            return False
        return True
    return False


_SECTION_RE = re.compile(r"^##.*`pcl_tpu\.([a-z_0-9.]+)`")
_BARE_RE = re.compile(r"^[a-z_][A-Za-z0-9_]*$")


def _claims() -> list[str]:
    text = DOC.read_text()
    claims: list[str] = []
    # Pass 1: sections headed "## ... — `pcl_tpu.<mod>`" scope bare
    # lowercase backticked names to that module.
    section_mod = None
    for line in text.splitlines():
        m = _SECTION_RE.match(line)
        if line.startswith("## "):
            section_mod = m.group(1) if m else None
            continue
        if section_mod is None:
            continue
        for raw in _TOKEN_RE.findall(line):
            tok = raw.split("(")[0].strip()
            for a in tok.split("/"):
                a = a.strip()
                if _BARE_RE.match(a):
                    claims.append(section_mod + "." + a)
    # Pass 2: explicit dotted paths anywhere in the document.
    for raw in _TOKEN_RE.findall(text):
        # Strip call suffixes / trailing prose fragments.
        tok = raw.split("(")[0].strip()
        # Slash-alternatives: `native.morton_encode/argsort` ->
        # [native.morton_encode, native.argsort].
        alts = tok.split("/")
        expanded: list[str] = []
        prefix = ""
        for a in alts:
            a = a.strip()
            if "." in a:
                expanded.append(a)
                prefix = a.rsplit(".", 1)[0]
            elif prefix and re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", a or ""):
                expanded.append(prefix + "." + a)
        for cand in expanded:
            if not _DOTTED_RE.match(cand):
                continue
            root = cand.split(".")[0]
            if root in _SUBMODULES:
                claims.append(cand)
    # Dedup, keep order.
    seen: set[str] = set()
    out = []
    for c in claims:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def test_coverage_doc_symbols_importable():
    claims = _claims()
    assert len(claims) > 100, f"parser regression: only {len(claims)} claims"
    missing = [c for c in claims if not _resolve(c)]
    assert not missing, f"COVERAGE.md names unimportable symbols: {missing}"


def test_ml_dual_svm_exported():
    assert hasattr(pcl_tpu.ml, "svm_train_dual")
    assert hasattr(pcl_tpu.ml, "svm_classify_dual")
