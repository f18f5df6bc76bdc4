#!/usr/bin/env python
"""Standby relay daemon — keep a local wire directory in sync with a
master's dump endpoint (the runnable shape of ``dump_server.relay_copy``;
the reference's slave dumper runs LogFileCopier.java in the same loop).
Pure Python, no Spark session.

    python tools/standby_relay.py HOST:PORT DEST_DIR [--stream S]
        [--interval SEC] [--once] [--no-stage-tail]

``--stage-tail`` is the default: the growing chain tail stays under an
underscore-staged name so a Structured Streaming consumer
(``streaming.source.wire_stream``) pointed at DEST_DIR never half-reads
a file. Run one process per Binlog-X stream (``--stream``) for a full
multi-stream standby.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polardbx_cdc_spark import dump_server as D  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("master", help="HOST:PORT of the dump endpoint")
    ap.add_argument("dest", help="local wire directory to maintain")
    ap.add_argument("--stream", default=None,
                    help="Binlog-X stream name (default: the global chain)")
    ap.add_argument("--interval", type=float, default=2.0,
                    help="seconds between sync passes (default 2)")
    ap.add_argument("--once", action="store_true",
                    help="one sync pass, then exit")
    ap.add_argument("--no-stage-tail", dest="stage_tail",
                    action="store_false", default=True,
                    help="write the chain tail under its real name")
    args = ap.parse_args()
    host, port_s = args.master.rsplit(":", 1)
    port = int(port_s)
    while True:
        try:
            touched = D.relay_copy(
                host, port, args.dest,
                stage_tail=args.stage_tail, stream=args.stream,
            )
            if touched:
                print(f"synced: {', '.join(touched)}", flush=True)
        except (OSError, ValueError) as exc:
            print(f"sync failed (will retry): {exc}", file=sys.stderr,
                  flush=True)
        if args.once:
            return
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
