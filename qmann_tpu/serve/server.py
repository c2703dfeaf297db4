"""TCP packet-stream server — the Xillybus FIFO endpoints
(/dev/xillybus_write_16 and /dev/xillybus_read_16, MemN2N/MemN2N.c:2275)
replaced by a socket: clients stream samples in the 16-bit packet format
and receive one answer packet per sample, in order.

    python -m qmann_tpu.serve.server --checkpoint <dir> --port 8765
"""
from __future__ import annotations

import argparse
import socket
import socketserver
import sys
import threading

from qmann_tpu.serve.engine import InferenceEngine
from qmann_tpu.serve.packet import PacketDecoder, encode_response


class PacketHandler(socketserver.BaseRequestHandler):
    def handle(self):
        engine: InferenceEngine = self.server.engine  # type: ignore
        decoder = PacketDecoder()
        pending = []
        lock = threading.Lock()
        done = threading.Event()

        def flusher():
            # answers return in submission order, one packet per sample
            # (the stream_read contract, MemN2N/MemN2N.c:3273-3284).
            # A failed wave must not break the one-packet-per-sample
            # framing: failed samples answer with the NULL index (0).
            while not done.is_set() or pending:
                with lock:
                    fut = pending.pop(0) if pending else None
                if fut is None:
                    done.wait(0.005)
                    continue
                try:
                    answer = fut.result(600)  # first compile can be minutes
                except Exception:
                    answer = 0  # NULL word — the protocol has no error code
                try:
                    self.request.sendall(encode_response(answer))
                except (BrokenPipeError, ConnectionResetError):
                    return

        t = threading.Thread(target=flusher, daemon=True)
        t.start()
        try:
            while True:
                data = self.request.recv(4096)
                if not data:
                    break
                for sample in decoder.feed(data):
                    fut = engine.submit_indexed(sample)
                    with lock:
                        pending.append(fut)
        finally:
            done.set()
            t.join(timeout=120)


class PacketServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True

    def __init__(self, addr, engine: InferenceEngine):
        super().__init__(addr, PacketHandler)
        self.engine = engine


def serve(engine: InferenceEngine, host: str = "127.0.0.1",
          port: int = 8765) -> PacketServer:
    server = PacketServer((host, port), engine)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qmann_tpu.serve.server")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--batch-size", type=int, default=64)
    args = p.parse_args(argv)

    from qmann_tpu.data.babi import DataDims, Dictionary
    from qmann_tpu.utils.checkpoint import load_checkpoint

    params, cfg, dims_dict = load_checkpoint(args.checkpoint)
    dims = DataDims(**dims_dict)
    # the dictionary travels next to the checkpoint
    import json
    import os
    dict_path = os.path.join(args.checkpoint, "dictionary.json")
    dictionary = Dictionary()
    if os.path.exists(dict_path):
        with open(dict_path) as f:
            for w in json.load(f)[1:]:
                dictionary.add(w)

    engine = InferenceEngine(params, cfg, dims, dictionary,
                             batch_size=args.batch_size).start()
    server = PacketServer((args.host, args.port), engine)
    print(f"serving on {args.host}:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
