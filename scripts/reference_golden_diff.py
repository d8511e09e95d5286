"""Executed-golden differential vs the reference converter (contingency).

The ONLY SURVEY §2 criterion still un-evidenced is byte-level output parity
of the DOM serialize / CSS rewrite against the reference actually RUNNING
(`/root/reference/mhtml-to-html-node.js`, entry `mod.js:62-75`).  The
reference needs the npm packages `glob` and `parse5`
(`/root/reference/package.json`) which are not installed and cannot be
fetched in this sandbox.  This script makes the comparison a one-command
affair the moment a `node_modules` becomes available:

    python scripts/reference_golden_diff.py [--keep] [--max-diffs N]

Protocol: write every deterministic fixture case (the same matrix the
engine's tests and bench use, `mhtml_to_html_ray/sources/fixtures.py`) to
`<tmp>/<family>__<case>.mht`, run the reference CLI over each to produce
`.html` goldens, run the engine's `convert-files` CLI over pristine copies,
and diff the two outputs byte-for-byte.  Exit 0 = all compared cases
byte-identical; exit 1 = diffs (each reported with the first divergent
offset and a context window); exit 2 = reference cannot execute here
(missing node or npm deps) — the environment-blocked case.

tests/test_reference_golden.py wraps this as a pytest that SKIPS on exit 2,
so the criterion turns green automatically once the deps exist.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_CLI = "/root/reference/mhtml-to-html-node.js"


def reference_available() -> bool:
    """True when node can load the reference CLI's import graph."""
    node = shutil.which("node")
    if node is None or not os.path.exists(REFERENCE_CLI):
        return False
    probe = subprocess.run(
        [node, "--input-type=module", "-e",
         "await Promise.all([import('glob'), import('parse5')])"],
        cwd=os.path.dirname(REFERENCE_CLI), capture_output=True,
    )
    return probe.returncode == 0


def _write_corpus(root: str) -> list[str]:
    from mhtml_to_html_ray.sources.fixtures import build_cases, case_url

    names = []
    for case in build_cases():
        name = f"{case.family}__{case.case}"
        with open(os.path.join(root, name + ".mht"), "wb") as handle:
            handle.write(case.html)  # the raw MHTML bytes (input_hint column)
        names.append(name)
        # keep the url for the report even though both CLIs work file-local
        with open(os.path.join(root, name + ".url"), "w") as handle:
            handle.write(case_url(case))
    return names


def run_diff(keep: bool = False, max_diffs: int = 20) -> int:
    if not reference_available():
        print("SKIP: reference cannot execute (node or npm deps missing: "
              "glob/parse5 per /root/reference/package.json)", file=sys.stderr)
        return 2

    root = tempfile.mkdtemp(prefix="golden_diff_")
    ref_dir = os.path.join(root, "ref")
    eng_dir = os.path.join(root, "eng")
    os.makedirs(ref_dir)
    os.makedirs(eng_dir)
    names = _write_corpus(ref_dir)
    for name in names:
        shutil.copy(os.path.join(ref_dir, name + ".mht"),
                    os.path.join(eng_dir, name + ".mht"))

    # reference side: one process over the whole corpus (its CLI accepts
    # multiple inputs and writes <input>.html next to each; corrupt inputs
    # log and continue — mod.js main())
    ref_proc = subprocess.run(
        ["node", REFERENCE_CLI] + [name + ".mht" for name in names],
        cwd=ref_dir, capture_output=True, text=True,
    )
    # engine side: the convert-files CLI (same per-file contract)
    eng_proc = subprocess.run(
        [sys.executable, "-m", "mhtml_to_html_ray.run", "convert-files"]
        + [name + ".mht" for name in names],
        cwd=eng_dir, capture_output=True, text=True,
        env=dict(os.environ, PYTHONPATH=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
    )
    if eng_proc.returncode != 0:
        print(eng_proc.stderr, file=sys.stderr)
        raise RuntimeError("engine convert-files failed")

    compared = identical = 0
    diffs: list[str] = []
    for name in names:
        ref_path = os.path.join(ref_dir, name + ".html")
        eng_path = os.path.join(eng_dir, name + ".html")
        ref_exists, eng_exists = os.path.exists(ref_path), os.path.exists(eng_path)
        if not ref_exists and not eng_exists:
            continue  # both sides rejected the input (corrupt-case parity)
        compared += 1
        if ref_exists != eng_exists:
            diffs.append(f"{name}: output existence differs "
                         f"(reference={ref_exists}, engine={eng_exists})")
            continue
        ref_bytes = open(ref_path, "rb").read()
        eng_bytes = open(eng_path, "rb").read()
        if ref_bytes == eng_bytes:
            identical += 1
            continue
        offset = next((i for i, (a, b) in enumerate(zip(ref_bytes, eng_bytes))
                       if a != b), min(len(ref_bytes), len(eng_bytes)))
        lo = max(0, offset - 40)
        diffs.append(
            f"{name}: first divergence at byte {offset} "
            f"(ref {len(ref_bytes)}B, eng {len(eng_bytes)}B)\n"
            f"  ref: {ref_bytes[lo:offset + 40]!r}\n"
            f"  eng: {eng_bytes[lo:offset + 40]!r}"
        )

    print(f"compared={compared} identical={identical} diffs={len(diffs)}")
    for line in diffs[:max_diffs]:
        print(line)
    if len(diffs) > max_diffs:
        print(f"... and {len(diffs) - max_diffs} more")
    if ref_proc.stderr.strip():
        print("reference stderr (expected for corrupt-input cases):",
              ref_proc.stderr.strip()[:500], file=sys.stderr)
    if keep:
        print(f"corpus kept at {root}")
    else:
        shutil.rmtree(root, ignore_errors=True)
    return 1 if diffs else 0


if __name__ == "__main__":
    keep = "--keep" in sys.argv
    max_diffs = 20
    if "--max-diffs" in sys.argv:
        max_diffs = int(sys.argv[sys.argv.index("--max-diffs") + 1])
    sys.exit(run_diff(keep=keep, max_diffs=max_diffs))
