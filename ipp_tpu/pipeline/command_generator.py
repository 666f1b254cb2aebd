"""Cluster command generator (reference command_generator.py:8-48 and
command_generator_batch.py): emit per-node shell command lists for the
export/merge stages so a cluster can split channels/cases across hosts."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import List

__all__ = ["generate_commands", "main"]


def generate_commands(cases: List[Path], command_template: str,
                      n_nodes: int) -> List[List[str]]:
    """Round-robin `cases` over `n_nodes`; template placeholders: {input},
    {name}."""
    buckets: List[List[str]] = [[] for _ in range(max(1, n_nodes))]
    for i, case in enumerate(sorted(cases)):
        cmd = command_template.format(input=str(case), name=Path(case).name)
        buckets[i % len(buckets)].append(cmd)
    return buckets


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="generate per-node command lists")
    p.add_argument("--input", "-i", required=True, type=Path,
                   help="directory whose subdirectories are the cases")
    p.add_argument("--template", "-t", required=True,
                   help="command template, e.g. 'python -m "
                        "ipp_tpu.pipeline.convert --input {input} "
                        "--output {input}_out --imaris'")
    p.add_argument("--nodes", "-n", type=int, default=1)
    p.add_argument("--output", "-o", type=Path, default=None,
                   help="write node_<i>.sh files here instead of stdout")
    args = p.parse_args(argv)
    cases = [d for d in args.input.iterdir() if d.is_dir()]
    buckets = generate_commands(cases, args.template, args.nodes)
    if args.output:
        args.output.mkdir(parents=True, exist_ok=True)
        for i, cmds in enumerate(buckets):
            (args.output / f"node_{i:02d}.sh").write_text(
                "#!/bin/sh\nset -e\n" + "\n".join(cmds) + "\n")
    else:
        for i, cmds in enumerate(buckets):
            print(f"# node {i}")
            for c in cmds:
                print(c)
    return 0


if __name__ == "__main__":
    sys.exit(main())
