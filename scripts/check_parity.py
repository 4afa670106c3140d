#!/usr/bin/env python3
"""check_options parity audit: every option the reference VALIDATES
(one_of / one_of_params / oneplus_of_params / func / same_length in each
component's check_options()) must be covered by a compile-time check in
the engine (Planner.optionChecks — dumped by graft.tools.OptAudit's
CHECK lines).

Usage:
    sbt -batch "runMain graft.tools.OptAudit" > /tmp/opts.txt
    python3 scripts/check_parity.py /tmp/opts.txt

Comparison is by CHECKED-OPTION-NAME coverage per node (the kinds may
legitimately differ: esp_default models its length rule as two funcs,
the engine as same_length — both cover field_values).
"""
import re
import sys
import pathlib

REF = pathlib.Path("/root/reference/apps/faxe/src")

# engine node name -> reference module (where the name isn't esp_<name>)
RENAMES = {
    "postgresql_query": "esp_crate_query",  # alias in the engine
    "modbus_multi": "esp_modbus",           # alias in the engine
}

# reference-side checks deliberately NOT compile-time here, with reasons
WHITELIST = {
    # parser-module existence (erlang:function_exported on parser_* LREP
    # codec modules) — deployment-side codecs behind the connector
    # boundary; the engine's parser node rejects unknown names at plan
    ("parser", "parser"),
    ("tcp_recv", "parser"),
    ("tcp_recv_line", "parser"),
    # mem .default validity depends on the runtime default_json flag
    # (jiffy decode only in json mode); plan-time MemStore raises instead
    ("mem", "default"),
    # json_emitter .start_ts is validated but not in the reference's own
    # options() list; the engine doesn't register the option
    ("json_emitter", "start_ts"),
    # crate_query_cont is not a standalone engine node (its incremental
    # poll lives in io/PollSource behind crate_query)
}

# reference modules with no engine node under any name
SKIP_MODULES = {"esp_crate_query_cont", "esp_aggregate_old",
                "esp_amqp_publish_deprecated"}


def ref_checked_options(module: str):
    for sub in ("components", "components/stats"):
        p = REF / sub / f"{module}.erl"
        if not p.exists():
            continue
        src = p.read_text(errors="replace")
        # strip erlang comments so commented-out checks don't count
        src = re.sub(r"%[^\n]*", "", src)
        m = re.search(r"check_options\(\)\s*->\s*\[(.*?)\]\s*\.", src, re.S)
        if not m:
            return set()
        body = m.group(1)
        names = set()
        for cm in re.finditer(
                r"\{\s*(one_of|func)\s*,\s*([a-z_0-9]+)", body):
            names.add(cm.group(2))
        for cm in re.finditer(
                r"\{\s*(one_of_params|oneplus_of_params|same_length)\s*,"
                r"\s*\[([^\]]*)\]", body):
            names |= set(re.findall(r"[a-z_0-9]+", cm.group(2)))
        return names
    return None


def main(opts_file: str) -> int:
    ours = {}
    for line in open(opts_file):
        if line.startswith("CHECK "):
            name, _, rest = line[len("CHECK "):].partition(":")
            ours[name.strip()] = set(rest.split())
    # every node with a reference module gets audited, even when the
    # engine declares NO checks for it (ours defaults to empty)
    engine_nodes = set()
    for line in open(opts_file):
        if not line.startswith("CHECK ") and ": " in line:
            engine_nodes.add(line.partition(":")[0].strip())
    missing_total = 0
    for name in sorted(engine_nodes):
        module = RENAMES.get(name, f"esp_{name}")
        if module in SKIP_MODULES:
            continue
        ref = ref_checked_options(module)
        if not ref:
            continue
        covered = ours.get(name, set())
        missing = {o for o in ref - covered
                   if (name, o) not in WHITELIST}
        if missing:
            print(f"MISSING {name}: {' '.join(sorted(missing))}")
            missing_total += len(missing)
    print(f"== nodes with reference checks audited | "
          f"uncovered validated options: {missing_total} ==")
    return 1 if missing_total else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
