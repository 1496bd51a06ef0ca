"""Black-box UDS client — the framework's analog of the reference's external
Go harness (/root/reference/Readme.md:30-40, scripts/test-go.sh:1-7).

Connects to a live server over the Unix socket and speaks ONLY wire bytes
(opcode-1 prove / opcode-2 verify, SURVEY.md §8.1) — no in-process imports of
the prover, so a pass here exercises the full stack: codec, dispatch,
batching queue, device prover/verifier, serialization.

Usage:
    python scripts/uds_client.py --bind-path /tmp/bb.sock            # 1 round trip
    python scripts/uds_client.py --bind-path /tmp/bb.sock --bench 8  # timed ops
"""

from __future__ import annotations

import argparse
import os
import socket
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dusk_blindbidproof_tpu.models.constants import mimc_constants  # noqa: E402
from dusk_blindbidproof_tpu.models.gadgets import mimc_hash  # noqa: E402
from dusk_blindbidproof_tpu.utils.curve_host import L, scalar_invert  # noqa: E402
from dusk_blindbidproof_tpu.utils.tlv import TlvReader, TlvWriter  # noqa: E402

LIST_LEN = 4


def build_prove_body(d: int, k: int, seed: int, extra: list[int], pos: int) -> tuple[bytes, dict]:
    """Derive consistent publics the way the canonical Go client does and
    TLV-encode an opcode-1 body (SURVEY.md §8.1)."""
    consts = mimc_constants()
    m = mimc_hash(k, 0, consts)
    x = mimc_hash(d, m, consts)
    y = mimc_hash(seed, x, consts)
    z = mimc_hash(seed, m, consts)
    y_inv = scalar_invert(y)
    q = d * y_inv % L
    pub_list = list(extra)
    pub_list.insert(pos, x)
    w = TlvWriter()
    for v in (d, k, y, y_inv, q, z, seed):
        w.write_scalar(v)
    w.write_list([v.to_bytes(32, "little") for v in pub_list])
    w.write_u64(pos)
    return w.getvalue(), dict(q=q, z_img=z, seed=seed, pub_list=pub_list)


def build_verify_body(proof_frame: bytes, pub: dict) -> bytes:
    w = TlvWriter()
    w.write(proof_frame)
    for v in (pub["q"], pub["z_img"], pub["seed"]):
        w.write_scalar(v)
    w.write_list([v.to_bytes(32, "little") for v in pub["pub_list"]])
    return w.getvalue()


def request(sock: socket.socket, opcode: int, body: bytes) -> bytes:
    w = TlvWriter()
    w.write(bytes([opcode]) + body)
    sock.sendall(w.getvalue())
    reader = TlvReader(sock.makefile("rb"))
    return reader.expect_frame("response")


def round_trip(path: str, seed_base: int) -> None:
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.connect(path)
        body, pub = build_prove_body(
            d=1000 + seed_base, k=2000 + seed_base, seed=3000 + seed_base,
            extra=[10 + i for i in range(LIST_LEN - 1)],
            pos=seed_base % LIST_LEN,
        )
        proof_frame = request(s, 1, body)
        assert proof_frame != b"\xff", "server answered error to prove"
        ok = request(s, 2, build_verify_body(proof_frame, pub))
        assert ok == b"\x01", f"verify rejected honest proof: {ok!r}"
        # mutated seed must be rejected with a clean 0x00 (not an error frame)
        bad = dict(pub)
        bad["seed"] = (pub["seed"] + 1) % L
        not_ok = request(s, 2, build_verify_body(proof_frame, bad))
        assert not_ok == b"\x00", f"verify accepted mutated publics: {not_ok!r}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bind-path", required=True)
    ap.add_argument("--bench", type=int, default=0,
                    help="run N timed prove+verify ops (scripts/bench-go.sh analog)")
    args = ap.parse_args()

    if args.bench:
        round_trip(args.bind_path, 0)  # warmup (compiles)
        t0 = time.perf_counter()
        for i in range(args.bench):
            round_trip(args.bind_path, i)
        dt = time.perf_counter() - t0
        print(f"BenchmarkProveVerify  {args.bench} ops  "
              f"{dt / args.bench:.3f} s/op")
    else:
        round_trip(args.bind_path, 0)
        print("TestProveVerify PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
