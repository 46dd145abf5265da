#!/usr/bin/env python
"""Demo build pipeline (reference: demo/rollup.config.js:1-66 — IIFE bundle,
minified + gzip, asset copy).

No node toolchain in this image, so the bundling is done here: the ES
modules under demo/src/ are concatenated in dependency order with their
import/export statements stripped, wrapped in one IIFE, whitespace/comment
minified, and gzipped. index.html is rewritten to load the bundle; exported
models are copied next to it when present.

  python tools/build_demo.py [--models exported_models] [--out demo/dist]
"""

from __future__ import annotations

import argparse
import gzip
import os
import re
import shutil

# dependency order (app last)
MODULES = ["camera.js", "inference.js", "image-utils.js", "app.js"]


def strip_modules(src: str) -> str:
    # drop import lines and export keywords — everything shares one IIFE scope
    src = re.sub(r"^import .*?;\s*$", "", src, flags=re.M)
    src = re.sub(r"^export\s+", "", src, flags=re.M)
    return src


def minify(src: str) -> str:
    out = []
    in_block = False
    for line in src.splitlines():
        if in_block:
            if "*/" in line:
                line = line.split("*/", 1)[1]
                in_block = False
            else:
                continue
        # strip /* ... */ (single-line) and line comments not inside strings
        line = re.sub(r"/\*.*?\*/", "", line)
        if "/*" in line:
            line = line.split("/*", 1)[0]
            in_block = True
        # conservative //-comment strip: only when no quote/URL appears before it
        m = re.search(r"//", line)
        if m and not re.search(r"['\"`:]", line[: m.start()]):
            line = line[: m.start()]
        line = line.strip()
        if line:
            out.append(line)
    return "\n".join(out)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--demo-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "demo"))
    parser.add_argument("--out", default=None)
    parser.add_argument("--models", default="exported_models",
                        help="deployment package to copy as models/ (rollup "
                             "asset copy parity)")
    args = parser.parse_args()

    demo = args.demo_dir
    out = args.out or os.path.join(demo, "dist")
    os.makedirs(out, exist_ok=True)

    parts = []
    for name in MODULES:
        with open(os.path.join(demo, "src", name)) as f:
            parts.append(f"/* == {name} == */\n" + strip_modules(f.read()))
    bundle = "(() => {\n'use strict';\n" + "\n".join(parts) + "\n})();\n"
    minified = minify(bundle)

    bundle_path = os.path.join(out, "bundle.min.js")
    with open(bundle_path, "w") as f:
        f.write(minified)
    # mtime=0 keeps the .gz byte-identical across rebuilds (no git churn)
    with open(bundle_path + ".gz", "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", compresslevel=9, mtime=0) as f:
            f.write(minified.encode())

    with open(os.path.join(demo, "index.html")) as f:
        html = f.read()
    html = html.replace(
        '<script type="module" src="src/app.js"></script>',
        '<script src="bundle.min.js"></script>',
    )
    with open(os.path.join(out, "index.html"), "w") as f:
        f.write(html)

    if args.models and os.path.isdir(args.models):
        dst = os.path.join(out, "models")
        os.makedirs(dst, exist_ok=True)
        for fn in os.listdir(args.models):
            if fn.endswith((".onnx", ".json")):
                shutil.copy2(os.path.join(args.models, fn), dst)

    raw = sum(
        os.path.getsize(os.path.join(demo, "src", m)) for m in MODULES
    )
    print(f"bundle: {raw} B src -> {os.path.getsize(bundle_path)} B min "
          f"-> {os.path.getsize(bundle_path + '.gz')} B gz -> {out}/")


if __name__ == "__main__":
    main()
