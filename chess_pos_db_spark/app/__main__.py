"""CLI entry point: `python -m chess_pos_db_spark.app [--tcp PORT]`.

Console mode (default) speaks the same line-JSON protocol as the
reference engine's console; --tcp starts the socket server the GUI
front-end would connect to.
"""

from __future__ import annotations

import argparse
import sys

from ..session import get_spark
from .server import Engine, console_loop, serve_tcp


def main() -> None:
    ap = argparse.ArgumentParser(prog="chess_pos_db_spark")
    ap.add_argument("--tcp", type=int, default=None, metavar="PORT",
                    help="serve the JSON protocol on a TCP port instead of stdio")
    args = ap.parse_args()

    engine = Engine(get_spark("chess_pos_db_spark-server"))
    if args.tcp is not None:
        server, thread, port = serve_tcp(engine, port=args.tcp)
        print(f'{{"ok": true, "listening": {port}}}', flush=True)
        try:
            thread.join()
        except KeyboardInterrupt:
            server.shutdown()
    else:
        console_loop(engine, sys.stdin, sys.stdout)


if __name__ == "__main__":
    main()
