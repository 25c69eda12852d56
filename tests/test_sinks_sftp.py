"""SFTP sink over a loopback SSH server (reference SFTPPipeline,
pipelines.py:2347-2467).

The server here runs the SAME from-scratch transport
(operators/ssh.SSHTransport) in its server role — so the test proves
both ends of the wire protocol agree: version exchange, curve25519
kex + ed25519 host-key signature, key derivation, aes128-ctr +
hmac-sha2-256 packet stream, password auth, session channel, SFTP v3
framing (including frames split across channel packets). Same pattern
as the MySQL/PG/Mongo/Cassandra loopback wire-protocol tests.
"""

from __future__ import annotations

import json
import os
import socket
import threading

import pytest

from silkworm_spark.operators.ssh import (
    MSG_CHANNEL_DATA,
    MSG_CHANNEL_OPEN,
    MSG_CHANNEL_OPEN_CONFIRMATION,
    MSG_CHANNEL_REQUEST,
    MSG_CHANNEL_SUCCESS,
    MSG_SERVICE_ACCEPT,
    MSG_SERVICE_REQUEST,
    MSG_USERAUTH_FAILURE,
    MSG_USERAUTH_REQUEST,
    MSG_USERAUTH_SUCCESS,
    SFTPClient,
    SSHError,
    SSHTransport,
    _Reader,
    _s,
    _u32,
)


class LoopbackSFTPServer(threading.Thread):
    """Single-connection-at-a-time SSH server with an SFTP subsystem
    writing under ``root`` (paths sandboxed, '..' rejected)."""

    def __init__(self, root: str, user: str = "crawler", password: str = "s3cret"):
        super().__init__(daemon=True)
        from cryptography.hazmat.primitives import serialization
        from cryptography.hazmat.primitives.asymmetric import ed25519

        self.root, self.user, self.password = root, user, password
        self.host_key = ed25519.Ed25519PrivateKey.generate()
        self.host_public = self.host_key.public_key().public_bytes(
            serialization.Encoding.Raw, serialization.PublicFormat.Raw
        )
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.port = self.sock.getsockname()[1]
        self._stop = False

    def stop(self):
        self._stop = True
        try:
            self.sock.close()
        except OSError:
            pass

    def run(self):
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            t = threading.Thread(target=self._serve, args=(conn,), daemon=True)
            t.start()

    def _path(self, raw: bytes) -> str:
        rel = raw.decode().lstrip("/")
        if ".." in rel.split("/"):
            raise SSHError("path escape")
        return os.path.join(self.root, rel)

    def _serve(self, conn: socket.socket) -> None:
        try:
            t = SSHTransport(conn, server=True, host_key=self.host_key, timeout_s=20)
            t.handshake()

            p = t.expect(MSG_SERVICE_REQUEST)
            assert _Reader(p[1:]).string() == b"ssh-userauth"
            t.send_packet(bytes([MSG_SERVICE_ACCEPT]) + _s(b"ssh-userauth"))

            while True:
                p = t.expect(MSG_USERAUTH_REQUEST)
                r = _Reader(p[1:])
                user, _svc, method = r.string(), r.string(), r.string()
                if method == b"password":
                    r.boolean()
                    pw = r.string()
                    if user.decode() == self.user and pw.decode() == self.password:
                        t.send_packet(bytes([MSG_USERAUTH_SUCCESS]))
                        break
                t.send_packet(
                    bytes([MSG_USERAUTH_FAILURE]) + _s(b"password") + b"\x00"
                )

            p = t.expect(MSG_CHANNEL_OPEN)
            r = _Reader(p[1:])
            assert r.string() == b"session"
            their_id = r.u32()
            t.send_packet(
                bytes([MSG_CHANNEL_OPEN_CONFIRMATION])
                + _u32(their_id) + _u32(0) + _u32(1 << 30) + _u32(32768)
            )
            p = t.expect(MSG_CHANNEL_REQUEST)
            r = _Reader(p[1:])
            r.u32()
            assert r.string() == b"subsystem" and r.boolean() and r.string() == b"sftp"
            t.send_packet(bytes([MSG_CHANNEL_SUCCESS]) + _u32(their_id))

            self._sftp_loop(t, their_id)
        except (SSHError, OSError, AssertionError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _sftp_loop(self, t: SSHTransport, chan: int) -> None:
        C = SFTPClient  # protocol constants
        buf = b""
        handles: dict[bytes, object] = {}
        hseq = 0

        def send(payload: bytes) -> None:
            t.send_packet(bytes([MSG_CHANNEL_DATA]) + _u32(chan) + _s(_s(payload)))

        def status(reqid: int, code: int = 0, msg: bytes = b"ok") -> None:
            send(bytes([C.FXP_STATUS]) + _u32(reqid) + _u32(code) + _s(msg) + _s(b""))

        while True:
            p = t.recv_msg()
            if p[0] != MSG_CHANNEL_DATA:
                if p[0] in (96, 97):  # EOF/CLOSE
                    return
                continue
            r = _Reader(p[1:])
            r.u32()
            buf += r.string()
            while len(buf) >= 4:
                import struct

                (n,) = struct.unpack(">I", buf[:4])
                if len(buf) < 4 + n:
                    break
                frame, buf = buf[4:4 + n], buf[4 + n:]
                typ = frame[0]
                fr = _Reader(frame[1:])
                if typ == C.FXP_INIT:
                    send(bytes([C.FXP_VERSION]) + _u32(3))
                    continue
                reqid = fr.u32()
                try:
                    if typ == C.FXP_MKDIR:
                        path = self._path(fr.string())
                        if os.path.isdir(path):
                            status(reqid, 4, b"already exists")
                        else:
                            os.makedirs(path)
                            status(reqid)
                    elif typ == C.FXP_OPEN:
                        path = self._path(fr.string())
                        fr.u32()  # pflags (sink always write|creat|trunc)
                        f = open(path, "wb")
                        hseq += 1
                        h = b"H%d" % hseq
                        handles[h] = f
                        send(bytes([C.FXP_HANDLE]) + _u32(reqid) + _s(h))
                    elif typ == C.FXP_WRITE:
                        h, off, data = fr.string(), fr.u64(), fr.string()
                        f = handles[h]
                        f.seek(off)
                        f.write(data)
                        status(reqid)
                    elif typ == C.FXP_CLOSE:
                        h = fr.string()
                        handles.pop(h).close()
                        status(reqid)
                    else:
                        status(reqid, 8, b"unsupported")
                except (OSError, KeyError, SSHError) as exc:
                    status(reqid, 4, str(exc).encode())


@pytest.fixture(scope="module")
def sftp_server(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sftp_root"))
    srv = LoopbackSFTPServer(root)
    srv.start()
    yield srv
    srv.stop()


@pytest.fixture
def items_df(spark):
    return spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", -0.5)],
        "id long, name string, score double",
    )


def test_sftp_sink_roundtrip(sftp_server, items_df):
    from silkworm_spark.operators.sinks import write_sftp_jsonl

    n = write_sftp_jsonl(
        items_df, "127.0.0.1", sftp_server.user, sftp_server.password,
        remote_path="out/items/part-0.jl", port=sftp_server.port,
        expected_host_key=sftp_server.host_public,
    )
    assert n == 3
    with open(os.path.join(sftp_server.root, "out/items/part-0.jl")) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    assert sorted(r["name"] for r in rows) == ["alpha", "beta", "gamma"]
    assert {r["id"]: r["score"] for r in rows}[3] == -0.5


def test_sftp_bad_password_rejected(sftp_server, items_df):
    from silkworm_spark.operators.sinks import write_sftp_jsonl

    with pytest.raises(SSHError, match="authentication failed"):
        write_sftp_jsonl(
            items_df, "127.0.0.1", sftp_server.user, "wrong-password",
            remote_path="nope.jl", port=sftp_server.port,
        )
    assert not os.path.exists(os.path.join(sftp_server.root, "nope.jl"))


def test_sftp_host_key_pinning(sftp_server, items_df):
    from silkworm_spark.operators.sinks import write_sftp_jsonl

    with pytest.raises(SSHError, match="host key mismatch"):
        write_sftp_jsonl(
            items_df, "127.0.0.1", sftp_server.user, sftp_server.password,
            remote_path="nope2.jl", port=sftp_server.port,
            expected_host_key=b"\x00" * 32,
        )


def test_sftp_large_payload_chunked(sftp_server, spark):
    """>200 KB forces many SFTP WRITE frames and channel-packet
    splits — exercises both directions' re-framing."""
    from silkworm_spark.operators.sinks import write_sftp_jsonl

    df = spark.range(2000).selectExpr(
        "id", "repeat('x', 100) AS blob"
    )
    n = write_sftp_jsonl(
        df, "127.0.0.1", sftp_server.user, sftp_server.password,
        remote_path="big.jl", port=sftp_server.port,
        expected_host_key=sftp_server.host_public,
    )
    assert n == 2000
    with open(os.path.join(sftp_server.root, "big.jl")) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 2000
    assert lines[0]["blob"] == "x" * 100 and lines[-1]["id"] == 1999


def test_transport_rejects_tampered_mac(sftp_server):
    """Flip one ciphertext bit on the wire after kex: the peer's HMAC
    check must fail — proving the MAC actually covers the stream."""
    sock = socket.create_connection(("127.0.0.1", sftp_server.port), timeout=10)
    t = SSHTransport(sock, server=False, timeout_s=10)
    try:
        t.handshake()
        # corrupt the next encrypted packet manually
        import os as _os

        payload = bytes([MSG_SERVICE_REQUEST]) + _s(b"ssh-userauth")
        block = 16
        pad = block - ((5 + len(payload)) % block)
        if pad < 4:
            pad += block
        packet = _u32(1 + len(payload) + pad) + bytes([pad]) + payload + _os.urandom(pad)
        import hashlib
        import hmac as hmac_mod

        mac = hmac_mod.new(t._mac_out, _u32(t._seq_out) + packet, hashlib.sha256).digest()
        ct = bytearray(t._enc.update(packet))
        ct[7] ^= 0x40  # tamper
        sock.sendall(bytes(ct) + mac)
        t._seq_out += 1
        with pytest.raises(SSHError):
            t.expect(MSG_SERVICE_ACCEPT)
    finally:
        t.close()
