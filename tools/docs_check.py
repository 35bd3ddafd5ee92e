#!/usr/bin/env python
"""Docs build-check: the pipeline analog of the reference's Sphinx docs CI
(/root/reference/.github/workflows/docs.yml builds the manual on every
push; there is no Sphinx here, so this stage makes the markdown manual a
CHECKED artifact instead of prose):

1. every repo-path reference in docs/*.md + README.md must exist;
2. every `--flag` documented in docs/input.md must exist in the CLI
   argparse, and every user-facing CLI flag must be documented;
3. maniac_tpu.__version__ must equal the repo-root VERSION file
   (single-source check, analog of version.txt templating).

Exit 1 with a findings list on any failure (ci.sh runs this as a stage).
"""
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# path-like tokens worth checking: start with a known top-level dir and
# contain no spaces/globs; strip trailing punctuation and :line suffixes
_PATH_RE = re.compile(
    r"(?<!reference/)\b((?:maniac_tpu|tools|tests|docs|examples|scripts)"
    r"/[\w./\-]+)")
_SKIP_SUFFIX = (".f90",)  # reference-tree citations live under /root/reference


def check_paths(findings):
    docs = [os.path.join(ROOT, "README.md")] + [
        os.path.join(ROOT, "docs", f)
        for f in sorted(os.listdir(os.path.join(ROOT, "docs")))
        if f.endswith(".md")]
    for path in docs:
        text = open(path).read()
        for m in _PATH_RE.finditer(text):
            # reference-tree citations ("reference: docs/source/x.rst",
            # "/root/reference/docs/...") point outside this repo
            if re.search(r"reference[:/]?\s*$", text[max(0, m.start() - 12)
                                                     :m.start()]):
                continue
            tok = m.group(1).rstrip(".,;:)")
            tok = re.sub(r":\d.*$", "", tok)
            if tok.endswith(_SKIP_SUFFIX) or tok.endswith("/"):
                continue
            # doc prose sometimes names an output pattern, not a file
            if "<" in tok or "*" in tok:
                continue
            if not os.path.exists(os.path.join(ROOT, tok)):
                findings.append(f"{os.path.relpath(path, ROOT)}: "
                                f"references missing path {tok!r}")


def check_cli_flags(findings):
    from maniac_tpu.cli import build_argparser
    parser = build_argparser()
    real = set()
    for a in parser._actions:
        for s in a.option_strings:
            if s.startswith("--"):
                real.add(s)
    real -= {"--help"}
    doc_text = open(os.path.join(ROOT, "docs", "input.md")).read()
    documented = set(re.findall(r"(--[a-z][\w\-]*)", doc_text))
    for flag in sorted(documented - real):
        findings.append(f"docs/input.md documents {flag} but the CLI "
                        f"does not define it")
    for flag in sorted(real - documented):
        findings.append(f"CLI flag {flag} is undocumented in docs/input.md")


def check_version(findings):
    import maniac_tpu
    want = open(os.path.join(ROOT, "VERSION")).read().strip()
    if maniac_tpu.__version__ != want:
        findings.append(f"maniac_tpu.__version__ "
                        f"({maniac_tpu.__version__}) != VERSION ({want})")


def main():
    findings = []
    check_paths(findings)
    check_cli_flags(findings)
    check_version(findings)
    if findings:
        for f_ in findings:
            print(f"DOCS-CHECK: {f_}")
        return 1
    print(f"docs-check OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
