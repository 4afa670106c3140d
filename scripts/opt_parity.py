#!/usr/bin/env python3
"""Option-surface parity audit: diff every reference component's
options() list (esp_*.erl / stats nodes) against the engine's registered
node options (graft.tools.OptAudit output).

Usage:
    sbt -batch "runMain graft.tools.OptAudit" | grep ': ' > /tmp/opts.txt
    python3 scripts/opt_parity.py /tmp/opts.txt

Prints, per node present on both sides:
    MISSING  <node>: options the reference declares that we don't accept
    EXTRA    <node>: options we accept that the reference doesn't declare
Nodes only on one side are listed at the end (renames/aliases/extensions).
"""
import re
import sys
import pathlib

REF = pathlib.Path("/root/reference/apps/faxe/src")

# engine node name -> reference module (where the name isn't esp_<name>)
RENAMES = {
    "aggregate": "esp_aggregate",
    "combine": "esp_combine",
    "value_emitter": "esp_value_emitter",
    "json_emitter": "esp_json_emitter",
    "modbus": "esp_modbus",
    "modbus_read": "esp_modbus_read",
    "mongo_query": "esp_mongo_query",
    "postgresql_query": "esp_crate_query",  # alias in the engine
}

# engine-side extensions with no reference counterpart (documented)
EXTENSIONS = {
    "parquet_read", "parquet_stream", "hash_sample", "pack_bins",
    "near_dedup", "@double", "@callback", "@python_time", "@path",
    "@less_than",
}


def ref_options(module: str):
    """Names of the TOP-LEVEL option tuples in options() — a depth-aware
    scan, because faxe default values are nested tuples themselves
    ({host, string, {crate, host}} must yield 'host', not 'crate')."""
    for sub in ("components", "components/stats"):
        p = REF / sub / f"{module}.erl"
        if not p.exists():
            continue
        src = p.read_text(errors="replace")
        m = re.search(r"options\(\)\s*->\s*\[(.*?)\]\s*\.", src, re.S)
        if not m:
            return set()
        body, depth, opts, i = m.group(1), 0, set(), 0
        while i < len(body):
            c = body[i]
            if c == "%":  # erlang comment to end of line
                i = body.find("\n", i)
                if i < 0:
                    break
                continue
            if c in "{[(":
                depth += 1
                if c == "{" and depth == 1:
                    nm = re.match(r"\{\s*([a-z_0-9]+)", body[i:])
                    if nm:
                        opts.add(nm.group(1))
            elif c in "}])":
                depth -= 1
            i += 1
        return opts
    return None


def main(opts_file: str) -> int:
    ours = {}
    for line in open(opts_file):
        if line.startswith("CHECK "):
            continue  # check-coverage lines belong to check_parity.py
        if ": " in line or line.strip().endswith(":"):
            name, _, rest = line.partition(":")
            ours[name.strip()] = set(rest.split())
    missing_total = 0
    unmatched = []
    for name, opts in sorted(ours.items()):
        if name in EXTENSIONS:
            continue
        module = RENAMES.get(name, f"esp_{name}")
        ref = ref_options(module)
        if ref is None:
            unmatched.append(name)
            continue
        missing = ref - opts
        extra = opts - ref
        if missing:
            print(f"MISSING {name}: {' '.join(sorted(missing))}")
            missing_total += len(missing)
        if extra:
            print(f"EXTRA   {name}: {' '.join(sorted(extra))}")
    if unmatched:
        print("no reference module (alias/registry form):",
              " ".join(sorted(unmatched)))
    print(f"== nodes checked: "
          f"{len([n for n in ours if n not in EXTENSIONS])} | "
          f"missing options: {missing_total} ==")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
