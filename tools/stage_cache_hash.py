#!/usr/bin/env python3
"""Recompute the StageCacheSpec builder-source hash (same algorithm: sorted
relative paths 'src/main/scala/...', path-bytes + content-bytes into one
sha-256). Run from the repo root; paste the output into
src/test/resources/stage_cache_versions.txt next to the bumped Version."""
import hashlib, os, re, sys
root = "src/main/scala"
rx = re.compile(r"(StageCache\.(through|stagedDir|modelSlot|modelSaved|modelLoaded)|memoDrain)")
# keep in sync with StageCacheSpec's ExtraBuilderDeps (round-18 ADVICE: known
# transitive builder dependencies with no call site of their own)
EXTRA = {"Tables.scala", "Schemas.scala", "SessionCache.scala",
         "TextExpressions.scala", "VectorExpressions.scala",
         "SketchExpressions.scala", "CentroidAggregator.scala"}
files = []
for dp, _, fns in os.walk(root):
    for fn in fns:
        if not fn.endswith(".scala"):
            continue
        p = os.path.join(dp, fn)
        data = open(p, "rb").read()
        if fn == "StageCache.scala" or fn in EXTRA or rx.search(data.decode("utf-8")):
            files.append((p, data))
files.sort(key=lambda t: t[0])
md = hashlib.sha256()
for p, data in files:
    md.update(p.encode("utf-8"))
    md.update(data)
print(md.hexdigest())
print("files:", " ".join(p for p, _ in files), file=sys.stderr)
