"""Unix-domain-socket prover/verifier daemon.

Behavioral port of the reference's IPC stack (SURVEY.md §8.1):
  * L7 CLI (/root/reference/src/main.rs:13-58): --bind-path (default
    $TMPDIR/dusk-uds-blindbid), --log-level.
  * L6/L5 server + dispatch (/root/reference/src/futures/main.rs:67-110):
    one TLV request frame per connection turn; payload[0] = opcode;
    1 = prove, 2 = verify; unknown opcode / parse failure answers an error
    frame and keeps the server alive (per-request error containment,
    SURVEY.md §5).
  * L4 codec: utils.tlv.

TPU-first difference: incoming requests are funneled into a batching queue —
concurrency becomes the device batch dimension (SURVEY.md §2.2 dusk-uds
row).  Requests sharing a circuit shape that arrive within the batching
window are proven/verified in one device pass.
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import os
import tempfile

from .errors import BlindBidError, TlvError, wrap_exception
from .models import blindbid
from .models.bid import Bid
from .models.blindbid import ProveRequest, VerifyRequest
from .models.proof_struct import BlindBidProof, R1CSProof
from .utils.curve_host import L
from .utils.tlv import TlvReader, TlvWriter

log = logging.getLogger("blindbid.server")

OP_PROVE = 1
OP_VERIFY = 2
ERROR_FRAME = b"\xff"  # error marker payload (the reference's Message::Error
# encoding lives in the unavailable dusk-uds pin; documented local choice)


def parse_prove_request(payload: bytes) -> ProveRequest:
    """Decode an opcode-1 body (proof.rs:97-115)."""
    r = TlvReader(payload)
    scalars = []
    for name in ("d", "k", "y", "y_inv", "q", "z_img", "seed"):
        raw = r.read_scalar_bytes()
        v = int.from_bytes(raw, "little")
        if v >= L:
            raise TlvError(f"non-canonical scalar {name}")
        scalars.append(v)
    # Scalar::from_bits decoding incl. quirk bid.rs:24 lives in models.bid
    pub_list = [b.x for b in Bid.try_list_from_reader(r)]
    toggle = r.read_u64()
    return ProveRequest(*scalars, pub_list=pub_list, toggle=toggle)


def encode_proof(proof: BlindBidProof) -> bytes:
    """proof.rs:118-143: TLV(r1cs bytes) ++ TLV-list(commitments) ++
    TLV-list(toggle commitments)."""
    w = TlvWriter()
    w.write(proof.r1cs.to_bytes())
    w.write_list(proof.commitments)
    w.write_list(proof.t_c)
    return w.getvalue()


def decode_proof(data: bytes) -> BlindBidProof:
    """proof.rs:145-183."""
    r = TlvReader(data)
    r1cs = R1CSProof.from_bytes(r.expect_frame("r1cs proof"))
    commitments = r.read_list()
    t_c = r.read_list()
    for c in commitments + t_c:
        if len(c) != 32:
            raise ValueError("compressed points must be 32 bytes")
    return BlindBidProof(r1cs=r1cs, commitments=commitments, t_c=t_c)


def parse_verify_request(payload: bytes) -> VerifyRequest:
    """verify.rs:91-128."""
    r = TlvReader(payload)
    proof = decode_proof(r.expect_frame("proof"))
    vals = []
    for name in ("score", "z_img", "seed"):
        raw = r.read_scalar_bytes()
        v = int.from_bytes(raw, "little")
        if v >= L:
            raise TlvError(f"non-canonical scalar {name}")
        vals.append(v)
    pub_list = [b.x for b in Bid.try_list_from_reader(r)]
    return VerifyRequest(proof, *vals, pub_list=pub_list)


class BatchingService:
    """Groups concurrent same-shape requests into single device passes."""

    # max_batch 16: batches pad to powers of two and the batch-32 phase
    # graphs crash the TPU compiler helper (BENCHMARKS.md); 16 is also the
    # best measured amortized s/op, so larger flushes split naturally.
    def __init__(self, window_ms: float = 5.0, max_batch: int = 16):
        self.window = window_ms / 1000.0
        self.max_batch = max_batch
        self._queues: dict = {}
        self._lock = asyncio.Lock()

    async def submit(self, kind: str, shape_key, item):
        """Returns the per-item result once its batch is flushed."""
        fut = asyncio.get_running_loop().create_future()
        key = (kind, shape_key)
        async with self._lock:
            q = self._queues.get(key)
            if q is None:
                q = self._queues[key] = []
                asyncio.get_running_loop().create_task(self._flush_later(key))
            q.append((item, fut))
            if len(q) >= self.max_batch:
                await self._flush(key)
        return await fut

    async def _flush_later(self, key):
        await asyncio.sleep(self.window)
        async with self._lock:
            await self._flush(key)

    async def _flush(self, key):
        q = self._queues.pop(key, None)
        if not q:
            return
        kind = key[0]
        items = [item for item, _ in q]
        futs = [fut for _, fut in q]
        loop = asyncio.get_running_loop()
        try:
            if kind == "prove":
                results = await loop.run_in_executor(
                    None, blindbid.prove_batch, items
                )
            else:
                results = await loop.run_in_executor(
                    None, blindbid.verify_batch, items
                )
            for fut, res in zip(futs, results):
                if not fut.done():
                    fut.set_result(res)
        except Exception as exc:  # pragma: no cover - error containment
            for fut in futs:
                if not fut.done():
                    fut.set_exception(exc)


class BlindBidServer:
    def __init__(self, bind_path: str, service: BatchingService | None = None):
        self.bind_path = bind_path
        self.service = service or BatchingService()
        self._server: asyncio.AbstractServer | None = None

    async def start(self):
        if os.path.exists(self.bind_path):
            os.unlink(self.bind_path)
        self._server = await asyncio.start_unix_server(
            self._handle, path=self.bind_path
        )
        log.info("listening on %s", self.bind_path)

    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter):
        try:
            while True:
                request = await self._read_frame(reader)
                if request is None:
                    break
                response = await self._dispatch(request)
                writer.write(response)
                await writer.drain()
        except (ConnectionError, asyncio.IncompleteReadError):
            pass
        finally:
            writer.close()

    async def _read_frame(self, reader: asyncio.StreamReader) -> bytes | None:
        # varint length prefix
        shift = 0
        n = 0
        while True:
            try:
                b = await reader.readexactly(1)
            except asyncio.IncompleteReadError:
                return None
            n |= (b[0] & 0x7F) << shift
            if not b[0] & 0x80:
                break
            shift += 7
            if shift > 63:
                raise ValueError("varint too long")
        return await reader.readexactly(n)

    async def _dispatch(self, request: bytes) -> bytes:
        w = TlvWriter()
        try:
            if not request:
                raise ValueError("empty request")
            opcode = request[0]
            body = request[1:]
            if opcode == OP_PROVE:
                req = parse_prove_request(body)
                proof = await self.service.submit(
                    "prove", len(req.pub_list), req
                )
                w.write(encode_proof(proof))
            elif opcode == OP_VERIFY:
                req = parse_verify_request(body)
                ok = await self.service.submit(
                    "verify",
                    (len(req.pub_list), len(req.proof.r1cs.ipp_L)),
                    req,
                )
                # verification failure is a normal 0x00 response
                # (futures/main.rs:95-100), not an error frame
                w.write(b"\x01" if ok else b"\x00")
            else:
                raise ValueError(f"unknown opcode {opcode}")
        except Exception as exc:
            # unified error domain (errors.py, the reference's error.rs):
            # any failure maps into BlindBidError and answers the error
            # frame, keeping the daemon alive (futures/main.rs:15-25)
            err = wrap_exception(exc)
            log.error("error resolving the request: [%s] %s",
                      type(err).__name__, err)
            w = TlvWriter()
            w.write(ERROR_FRAME)
        return w.getvalue()

    async def serve_forever(self):
        await self.start()
        async with self._server:
            await self._server.serve_forever()


def default_bind_path() -> str:
    return os.path.join(tempfile.gettempdir(), "dusk-uds-blindbid")


def main(argv=None):
    ap = argparse.ArgumentParser("dusk-blindbidproof-tpu")
    ap.add_argument("-b", "--bind-path", default=default_bind_path(),
                    help="Bind path")
    ap.add_argument("-l", "--log-level", default="info",
                    choices=["error", "warn", "info", "debug", "trace"])
    args = ap.parse_args(argv)
    level = {"error": logging.ERROR, "warn": logging.WARNING,
             "info": logging.INFO, "debug": logging.DEBUG,
             "trace": logging.DEBUG}[args.log_level]
    logging.basicConfig(level=level)
    asyncio.run(BlindBidServer(args.bind_path).serve_forever())


if __name__ == "__main__":
    main()
