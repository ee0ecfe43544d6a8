#!/usr/bin/env python3
"""Leak scanner: proves the repo references only public knowledge.

Scans every tracked source/doc file for seven categories of
proprietary-reference risk and writes LEAKCHECK.json with the hit list
PLUS provenance (files scanned, bytes, UTC timestamp, pattern version) so
a round bump in the artifact is distinguishable from a hand edit.

Approach: allowlists, not blocklists — the scanner cannot (and must not)
name any internal system, so it flags anything OUTSIDE the known-public
surface: imports beyond the public package roots, URLs beyond public
domains, cloud-bucket URIs, slack links, API-key shapes, and environment
variables beyond the engine's own namespace.

Usage: python3 tools/leakcheck.py [round_number]
"""
import json, os, re, sys, datetime

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATTERN_VERSION = 1

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".json", ".sql", ".properties", ".conf"}
SKIP_DIRS = {"target", "spark-warehouse", ".git", ".claude", "project"}
SKIP_FILES = {"LEAKCHECK.json",  # the output itself
              "leakcheck.py"}    # defines the patterns it would match

PUBLIC_IMPORT_ROOTS = (
    "scala", "java", "javax", "graft",
    "org.apache", "org.scalatest", "org.scalacheck", "org.slf4j",
)
PUBLIC_DOMAINS = (
    "github.com", "arxiv.org", "apache.org", "spark.apache.org",
    "duckdb.org", "mysql.com", "dev.mysql.com", "scala-lang.org",
    "scalatest.org", "maven.org", "repo1.maven.org", "localhost",
    "example.com", "nn",  # nn:8020 — the placeholder namenode in docs
)
ENV_ALLOW_PREFIX = ("SPARK_", "GRAFT_", "JAVA_", "COURSIER_", "SBT_", "PATH",
                    "HOME", "USER", "TMPDIR", "LANG", "TZ")

CATS = ["internal-import", "internal-url", "internal-pkg2", "internal-bucket",
        "slack-link", "api-key", "axon-env"]

IMPORT_RE = re.compile(r"^\s*import\s+([A-Za-z_][\w.]*)")
PKG_RE = re.compile(r"^\s*package\s+([A-Za-z_][\w.]*)")
URL_RE = re.compile(r"https?://([A-Za-z0-9.-]+)")
BUCKET_RE = re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[A-Za-z0-9._-]+")
# actual slack LINKS/handles, not the English word (angle "slack" is a
# legitimate numeric term in the similarity code)
SLACK_RE = re.compile(r"slack\.com|app\.slack|slack://|hooks\.slack", re.IGNORECASE)
KEY_RES = [
    re.compile(r"\bsk-[A-Za-z0-9]{20,}"),
    re.compile(r"\bAKIA[0-9A-Z]{16}\b"),
    re.compile(r"\bghp_[A-Za-z0-9]{30,}"),
    re.compile(r"\bxox[baprs]-[A-Za-z0-9-]{10,}"),
    re.compile(r"\bAIza[0-9A-Za-z_-]{35}"),
    re.compile(r"-----BEGIN [A-Z ]*PRIVATE KEY"),
]
ENV_RE = re.compile(r"""(?:sys\.env(?:\.get(?:OrElse)?)?\s*\(\s*|getenv\s*\(\s*|os\.environ(?:\.get)?\s*[\[(]\s*)["']([A-Z][A-Z0-9_]*)["']""")


def scan_file(path, rel, hits):
    try:
        with open(path, encoding="utf-8", errors="replace") as f:
            lines = f.readlines()
    except OSError:
        return 0
    for i, line in enumerate(lines, 1):
        where = f"{rel}:{i}"
        m = IMPORT_RE.match(line)
        if m and rel.endswith((".scala", ".sbt")):
            root = m.group(1)
            head = root.split(".")[0]
            # local-scope imports (a lowercase val like `spark.implicits._`,
            # unless it's a reverse-domain root) and in-scope object imports
            # (`Similarity.asDouble`, `StorageLevel.MEMORY_AND_DISK`) are
            # not package references
            local_val = head[:1].islower() and head not in (
                "com", "net", "io", "dev", "ai", "co", "edu", "gov")
            in_scope_obj = head[:1].isupper()
            if not (local_val or in_scope_obj) and not any(
                    root == p or root.startswith(p + ".") for p in PUBLIC_IMPORT_ROOTS):
                hits["internal-import"].append(f"{where} {m.group(1)}")
        m = PKG_RE.match(line)
        if m and rel.endswith(".scala") and not (
                m.group(1).startswith("graft")
                # GraftBridge: the deliberate private[sql] accessor lives in
                # Spark's own (public) namespace
                or m.group(1).startswith("org.apache.spark")):
            hits["internal-pkg2"].append(f"{where} {m.group(1)}")
        for m in URL_RE.finditer(line):
            dom = m.group(1).lower().rstrip(".")
            if not any(dom == d or dom.endswith("." + d) for d in PUBLIC_DOMAINS):
                hits["internal-url"].append(f"{where} {m.group(0)}")
        for m in BUCKET_RE.finditer(line):
            hits["internal-bucket"].append(f"{where} {m.group(0)}")
        if SLACK_RE.search(line):
            hits["slack-link"].append(f"{where} {line.strip()[:80]}")
        for kr in KEY_RES:
            if kr.search(line):
                hits["api-key"].append(f"{where} {kr.pattern[:30]}")
        for m in ENV_RE.finditer(line):
            var = m.group(1)
            if not any(var.startswith(p) or var == p.rstrip("_") for p in ENV_ALLOW_PREFIX):
                hits["axon-env"].append(f"{where} {var}")
    return len(lines)


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {c: [] for c in CATS}
    n_files = n_lines = 0
    for dirpath, dirnames, filenames in os.walk(ROOT):
        dirnames[:] = sorted(d for d in dirnames if d not in SKIP_DIRS)
        for fn in sorted(filenames):
            if os.path.splitext(fn)[1] not in SCAN_EXT or fn in SKIP_FILES:
                continue
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, ROOT)
            n_lines += scan_file(p, rel, hits)
            n_files += 1
    out = {
        "round": rnd,
        "pattern_version": PATTERN_VERSION,
        "scanned_files": n_files,
        "scanned_lines": n_lines,
        "scanned_at_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"[leakcheck] round={rnd} files={n_files} lines={n_lines} "
          f"hits={out['n_hits']}")
    for c, v in hits.items():
        for h in v[:20]:
            print(f"  {c}: {h}")


if __name__ == "__main__":
    main()
