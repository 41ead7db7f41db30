"""Generate committed golden files from the compiled reference binaries.

Run from the repo root after compiling tests/tools/ref_{stem,parse}_dumper:
    python tests/tools/gen_goldens.py
Writes tests/golden/stems.tsv and tests/golden/parse_hashes.tsv so the
conformance tests still run in compiler-less environments.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from search_engine_ray.sources.fixtures import gen_pages  # noqa: E402
from tests.test_stemmer import build_vocab  # noqa: E402

TOOLS = os.path.join(REPO, "tests", "tools")
GOLDEN = os.path.join(REPO, "tests", "golden")


def main() -> None:
    os.makedirs(GOLDEN, exist_ok=True)

    vocab = build_vocab()
    out = subprocess.run([os.path.join(TOOLS, "ref_stem_dumper")],
                         input="\n".join(vocab) + "\n",
                         capture_output=True, text=True, check=True)
    stems = out.stdout.split("\n")
    with open(os.path.join(GOLDEN, "stems.tsv"), "w") as f:
        for w, s in zip(vocab, stems):
            f.write(f"{w}\t{s}\n")
    print(f"stems.tsv: {len(vocab)} words")

    tbl = gen_pages(400)
    htmls = tbl.column("html").to_pylist()
    with open(os.path.join(GOLDEN, "parse_hashes.tsv"), "w") as f:
        for idx, h in enumerate(htmls):
            with tempfile.NamedTemporaryFile(delete=False) as tf:
                tf.write(h)
                path = tf.name
            dump = subprocess.run([os.path.join(TOOLS, "ref_parse_dumper"),
                                   path], capture_output=True,
                                  timeout=30).stdout
            os.unlink(path)
            f.write(f"{idx}\t{hashlib.sha256(dump).hexdigest()}\n")
    print(f"parse_hashes.tsv: {len(htmls)} pages")


if __name__ == "__main__":
    main()
