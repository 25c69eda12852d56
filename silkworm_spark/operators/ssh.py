"""Minimal SSH-2 transport + SFTPv3 client, from the stdlib + pyca
``cryptography`` primitives — no paramiko in this sandbox.

Implements exactly one interoperable cipher suite (the modern
mandatory-to-implement set):

- key exchange  curve25519-sha256        (RFC 8731)
- host key      ssh-ed25519              (RFC 8709)
- cipher        aes128-ctr               (RFC 4344)
- MAC           hmac-sha2-256            (RFC 6668)
- auth          password                 (RFC 4252)
- channels      session + sftp subsystem (RFC 4254)
- file protocol SFTP v3 (draft-ietf-secsh-filexfer-02): INIT, OPEN,
  WRITE, CLOSE, MKDIR

The transport speaks BOTH roles: the client backs the
``write_sftp_jsonl`` sink (reference SFTPPipeline,
pipelines.py:2347-2467, which wraps asyncssh); the server role exists
so the loopback test in tests/test_sinks_sftp.py can verify the whole
stack — binary packet framing, kex hash, key derivation, MAC check,
auth, channel flow — against real wire bytes, the same pattern as the
MySQL/PG/Mongo/Cassandra wire-protocol sinks.

Deliberately NOT implemented (fail loudly rather than pretend):
rekeying, compression, agent/pubkey auth, flow-control beyond a large
fixed window, and SFTP reads — the sink only creates directories and
uploads.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import os
import socket
import struct

VERSION_STRING = b"SSH-2.0-silkworm_spark_0.1"

# RFC 4250 message numbers
MSG_DISCONNECT = 1
MSG_IGNORE = 2
MSG_UNIMPLEMENTED = 3
MSG_DEBUG = 4
MSG_SERVICE_REQUEST = 5
MSG_SERVICE_ACCEPT = 6
MSG_KEXINIT = 20
MSG_NEWKEYS = 21
MSG_KEX_ECDH_INIT = 30
MSG_KEX_ECDH_REPLY = 31
MSG_USERAUTH_REQUEST = 50
MSG_USERAUTH_FAILURE = 51
MSG_USERAUTH_SUCCESS = 52
MSG_CHANNEL_OPEN = 90
MSG_CHANNEL_OPEN_CONFIRMATION = 91
MSG_CHANNEL_OPEN_FAILURE = 92
MSG_CHANNEL_WINDOW_ADJUST = 93
MSG_CHANNEL_DATA = 94
MSG_CHANNEL_EOF = 96
MSG_CHANNEL_CLOSE = 97
MSG_CHANNEL_REQUEST = 98
MSG_CHANNEL_SUCCESS = 99
MSG_CHANNEL_FAILURE = 100

KEX_ALG = b"curve25519-sha256"
HOSTKEY_ALG = b"ssh-ed25519"
CIPHER_ALG = b"aes128-ctr"
MAC_ALG = b"hmac-sha2-256"


class SSHError(Exception):
    pass


# ---- wire primitives (RFC 4251 §5) ----

def _u32(v: int) -> bytes:
    return struct.pack(">I", v)


def _u64(v: int) -> bytes:
    return struct.pack(">Q", v)


def _s(b: bytes) -> bytes:
    return _u32(len(b)) + b


def _mpint(v: int) -> bytes:
    if v == 0:
        return _u32(0)
    b = v.to_bytes((v.bit_length() + 7) // 8, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return _s(b)


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def byte(self) -> int:
        self.pos += 1
        return self.data[self.pos - 1]

    def boolean(self) -> bool:
        return self.byte() != 0

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.data, self.pos)
        self.pos += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.data, self.pos)
        self.pos += 8
        return v

    def string(self) -> bytes:
        n = self.u32()
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def namelist(self) -> list[bytes]:
        raw = self.string()
        return raw.split(b",") if raw else []


def _kexinit_payload() -> bytes:
    nl = _s  # a name-list is a string of comma-joined names
    return (
        bytes([MSG_KEXINIT]) + os.urandom(16)
        + nl(KEX_ALG) + nl(HOSTKEY_ALG)
        + nl(CIPHER_ALG) + nl(CIPHER_ALG)
        + nl(MAC_ALG) + nl(MAC_ALG)
        + nl(b"none") + nl(b"none")
        + nl(b"") + nl(b"")
        + b"\x00" + _u32(0)
    )


class SSHTransport:
    """One SSH-2 connection end (client or server role): version
    exchange → kex → encrypted packet stream. Packets after NEWKEYS are
    aes128-ctr over the whole packet (length included) with
    HMAC-SHA256(seq ‖ plaintext) appended (RFC 4253 §6)."""

    def __init__(self, sock: socket.socket, server: bool = False,
                 host_key=None, timeout_s: float = 30.0) -> None:
        from cryptography.hazmat.primitives.asymmetric import ed25519

        self.sock = sock
        self.server = server
        sock.settimeout(timeout_s)
        if server and host_key is None:
            host_key = ed25519.Ed25519PrivateKey.generate()
        self.host_key = host_key
        self._buf = b""
        self._seq_out = 0
        self._seq_in = 0
        self._enc = self._dec = None  # cipher contexts after NEWKEYS
        self._mac_out = self._mac_in = None
        self.session_id: bytes | None = None
        self.server_host_public: bytes | None = None  # raw ed25519 key

    # ---- raw I/O ----

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise SSHError("connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _recv_line(self) -> bytes:
        while b"\n" not in self._buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise SSHError("connection closed in version exchange")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\n", 1)
        return line.rstrip(b"\r")

    # ---- packet layer ----

    def send_packet(self, payload: bytes) -> None:
        block = 16
        pad = block - ((5 + len(payload)) % block)
        if pad < 4:
            pad += block
        packet = _u32(1 + len(payload) + pad) + bytes([pad]) + payload + os.urandom(pad)
        if self._enc is not None:
            mac = hmac_mod.new(
                self._mac_out, _u32(self._seq_out) + packet, hashlib.sha256
            ).digest()
            packet = self._enc.update(packet) + mac
        self.sock.sendall(packet)
        self._seq_out += 1

    def recv_packet(self) -> bytes:
        if self._dec is not None:
            head = self._dec.update(self._recv_exact(16))
            (plen,) = struct.unpack(">I", head[:4])
            if plen > 1 << 22:
                raise SSHError(f"packet too large: {plen}")
            rest = self._dec.update(self._recv_exact(plen - 12))
            mac = self._recv_exact(32)
            plain = head + rest
            want = hmac_mod.new(
                self._mac_in, _u32(self._seq_in) + plain, hashlib.sha256
            ).digest()
            if not hmac_mod.compare_digest(mac, want):
                raise SSHError("MAC verification failed")
        else:
            head = self._recv_exact(4)
            (plen,) = struct.unpack(">I", head)
            if plen > 1 << 22:
                raise SSHError(f"packet too large: {plen}")
            plain = head + self._recv_exact(plen)
        self._seq_in += 1
        pad = plain[4]
        return plain[5:len(plain) - pad]

    def recv_msg(self) -> bytes:
        """Next non-transport-noise packet (skips IGNORE/DEBUG/
        UNIMPLEMENTED; raises on DISCONNECT)."""
        while True:
            p = self.recv_packet()
            if not p:
                continue
            t = p[0]
            if t in (MSG_IGNORE, MSG_DEBUG, MSG_UNIMPLEMENTED):
                continue
            if t == MSG_DISCONNECT:
                r = _Reader(p[1:])
                r.u32()
                raise SSHError(f"disconnected by peer: {r.string()!r}")
            return p

    def expect(self, msg_type: int) -> bytes:
        p = self.recv_msg()
        if p[0] != msg_type:
            raise SSHError(f"expected message {msg_type}, got {p[0]}")
        return p

    # ---- key exchange (RFC 4253 §7 + RFC 8731) ----

    def handshake(self, expected_host_key: bytes | None = None) -> None:
        from cryptography.hazmat.primitives.asymmetric import ed25519, x25519
        from cryptography.hazmat.primitives.ciphers import (
            Cipher, algorithms, modes,
        )

        self.sock.sendall(VERSION_STRING + b"\r\n")
        peer_version = self._recv_line()
        while not peer_version.startswith(b"SSH-"):  # pre-banner lines
            peer_version = self._recv_line()
        if not peer_version.startswith(b"SSH-2.0-"):
            raise SSHError(f"unsupported peer version {peer_version!r}")

        my_kexinit = _kexinit_payload()
        self.send_packet(my_kexinit)
        peer_kexinit = self.expect(MSG_KEXINIT)
        r = _Reader(peer_kexinit[1:])
        r.pos += 16  # cookie
        their_kex = r.namelist()
        their_hostkey = r.namelist()
        if KEX_ALG not in their_kex or HOSTKEY_ALG not in their_hostkey:
            raise SSHError(
                f"no common algorithms: kex={their_kex} hostkey={their_hostkey}"
            )

        if self.server:
            v_c, v_s = peer_version, VERSION_STRING
            i_c, i_s = peer_kexinit, my_kexinit
        else:
            v_c, v_s = VERSION_STRING, peer_version
            i_c, i_s = my_kexinit, peer_kexinit

        eph = x25519.X25519PrivateKey.generate()
        from cryptography.hazmat.primitives import serialization

        raw = serialization.Encoding.Raw, serialization.PublicFormat.Raw
        q_mine = eph.public_key().public_bytes(*raw)

        if self.server:
            init = self.expect(MSG_KEX_ECDH_INIT)
            q_c = _Reader(init[1:]).string()
            k = eph.exchange(x25519.X25519PublicKey.from_public_bytes(q_c))
            host_pub = self.host_key.public_key().public_bytes(*raw)
            k_s = _s(HOSTKEY_ALG) + _s(host_pub)
            h = hashlib.sha256(
                _s(v_c) + _s(v_s) + _s(i_c) + _s(i_s) + _s(k_s)
                + _s(q_c) + _s(q_mine) + _mpint(int.from_bytes(k, "big"))
            ).digest()
            sig = _s(HOSTKEY_ALG) + _s(self.host_key.sign(h))
            self.send_packet(
                bytes([MSG_KEX_ECDH_REPLY]) + _s(k_s) + _s(q_mine) + _s(sig)
            )
        else:
            self.send_packet(bytes([MSG_KEX_ECDH_INIT]) + _s(q_mine))
            reply = self.expect(MSG_KEX_ECDH_REPLY)
            r = _Reader(reply[1:])
            k_s, q_s, sig_blob = r.string(), r.string(), r.string()
            kr = _Reader(k_s)
            if kr.string() != HOSTKEY_ALG:
                raise SSHError("unexpected host key type")
            host_pub = kr.string()
            self.server_host_public = host_pub
            if expected_host_key is not None and host_pub != expected_host_key:
                raise SSHError("host key mismatch")
            k = eph.exchange(x25519.X25519PublicKey.from_public_bytes(q_s))
            h = hashlib.sha256(
                _s(v_c) + _s(v_s) + _s(i_c) + _s(i_s) + _s(k_s)
                + _s(q_mine) + _s(q_s) + _mpint(int.from_bytes(k, "big"))
            ).digest()
            sr = _Reader(sig_blob)
            if sr.string() != HOSTKEY_ALG:
                raise SSHError("unexpected signature type")
            ed25519.Ed25519PublicKey.from_public_bytes(host_pub).verify(
                sr.string(), h
            )

        self.session_id = h
        k_mp = _mpint(int.from_bytes(k, "big"))

        def derive(tag: bytes, length: int) -> bytes:
            out = hashlib.sha256(k_mp + h + tag + self.session_id).digest()
            while len(out) < length:
                out += hashlib.sha256(k_mp + h + out).digest()
            return out[:length]

        iv_c2s, iv_s2c = derive(b"A", 16), derive(b"B", 16)
        key_c2s, key_s2c = derive(b"C", 16), derive(b"D", 16)
        mac_c2s, mac_s2c = derive(b"E", 32), derive(b"F", 32)

        self.send_packet(bytes([MSG_NEWKEYS]))
        self.expect(MSG_NEWKEYS)

        def ctr(key: bytes, iv: bytes):
            return Cipher(algorithms.AES(key), modes.CTR(iv))

        if self.server:
            self._enc = ctr(key_s2c, iv_s2c).encryptor()
            self._dec = ctr(key_c2s, iv_c2s).decryptor()
            self._mac_out, self._mac_in = mac_s2c, mac_c2s
        else:
            self._enc = ctr(key_c2s, iv_c2s).encryptor()
            self._dec = ctr(key_s2c, iv_s2c).decryptor()
            self._mac_out, self._mac_in = mac_c2s, mac_s2c

    # ---- client auth + channel (RFC 4252/4254) ----

    def auth_password(self, username: str, password: str) -> None:
        self.send_packet(
            bytes([MSG_SERVICE_REQUEST]) + _s(b"ssh-userauth")
        )
        self.expect(MSG_SERVICE_ACCEPT)
        self.send_packet(
            bytes([MSG_USERAUTH_REQUEST])
            + _s(username.encode()) + _s(b"ssh-connection")
            + _s(b"password") + b"\x00" + _s(password.encode())
        )
        p = self.recv_msg()
        if p[0] != MSG_USERAUTH_SUCCESS:
            raise SSHError("authentication failed")

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class SFTPClient:
    """SFTP v3 over an authenticated transport's session channel."""

    FXP_INIT, FXP_VERSION = 1, 2
    FXP_OPEN, FXP_CLOSE, FXP_WRITE = 3, 4, 6
    FXP_MKDIR = 14
    FXP_STATUS, FXP_HANDLE = 101, 102
    FX_OK = 0
    FLAG_WRITE, FLAG_CREAT, FLAG_TRUNC = 0x02, 0x08, 0x10

    def __init__(self, transport: SSHTransport) -> None:
        self.t = transport
        self.local_id = 0
        self._reqid = 0
        self._inbuf = b""
        t = self.t
        t.send_packet(
            bytes([MSG_CHANNEL_OPEN]) + _s(b"session")
            + _u32(self.local_id) + _u32(1 << 30) + _u32(32768)
        )
        p = t.expect(MSG_CHANNEL_OPEN_CONFIRMATION)
        r = _Reader(p[1:])
        r.u32()  # our id echoed
        self.remote_id = r.u32()
        self.remote_window = r.u32()
        self.remote_maxpacket = min(r.u32() or 32768, 32768)
        t.send_packet(
            bytes([MSG_CHANNEL_REQUEST]) + _u32(self.remote_id)
            + _s(b"subsystem") + b"\x01" + _s(b"sftp")
        )
        self._wait_channel(MSG_CHANNEL_SUCCESS)
        self._send_sftp(bytes([self.FXP_INIT]) + _u32(3))
        resp = self._recv_sftp()
        if resp[0] != self.FXP_VERSION:
            raise SSHError("SFTP INIT rejected")

    # channel data plumbing: SFTP frames can split/merge across
    # CHANNEL_DATA packets, so both directions re-frame explicitly
    def _wait_channel(self, msg_type: int) -> bytes:
        while True:
            p = self.t.recv_msg()
            t = p[0]
            if t == msg_type:
                return p
            if t == MSG_CHANNEL_WINDOW_ADJUST:
                self.remote_window += _Reader(p[5:]).u32()
            elif t == MSG_CHANNEL_DATA:
                r = _Reader(p[1:])
                r.u32()
                self._inbuf += r.string()
            elif t in (MSG_CHANNEL_EOF, MSG_CHANNEL_CLOSE, MSG_CHANNEL_FAILURE):
                raise SSHError(f"channel closed while waiting (msg {t})")

    def _send_sftp(self, payload: bytes) -> None:
        data = _s(payload)
        while data:
            chunk, data = data[:self.remote_maxpacket], data[self.remote_maxpacket:]
            if self.remote_window < len(chunk):
                self._wait_channel(MSG_CHANNEL_WINDOW_ADJUST)
            self.remote_window -= len(chunk)
            self.t.send_packet(
                bytes([MSG_CHANNEL_DATA]) + _u32(self.remote_id) + _s(chunk)
            )

    def _recv_sftp(self) -> bytes:
        while True:
            if len(self._inbuf) >= 4:
                (n,) = struct.unpack(">I", self._inbuf[:4])
                if len(self._inbuf) >= 4 + n:
                    out = self._inbuf[4:4 + n]
                    self._inbuf = self._inbuf[4 + n:]
                    return out
            p = self._wait_channel(MSG_CHANNEL_DATA)
            r = _Reader(p[1:])
            r.u32()
            self._inbuf += r.string()

    def _req(self, typ: int, body: bytes) -> bytes:
        self._reqid += 1
        self._send_sftp(bytes([typ]) + _u32(self._reqid) + body)
        resp = self._recv_sftp()
        r = _Reader(resp[1:])
        if r.u32() != self._reqid:
            raise SSHError("SFTP response id mismatch")
        return resp

    def _check_status(self, resp: bytes) -> None:
        if resp[0] != self.FXP_STATUS:
            raise SSHError(f"unexpected SFTP response {resp[0]}")
        r = _Reader(resp[1:])
        r.u32()
        code = r.u32()
        if code != self.FX_OK:
            raise SSHError(f"SFTP error {code}: {r.string().decode()!r}")

    def mkdir(self, path: str) -> None:
        resp = self._req(self.FXP_MKDIR, _s(path.encode()) + _u32(0))
        self._check_status(resp)

    def open_write(self, path: str) -> bytes:
        resp = self._req(
            self.FXP_OPEN,
            _s(path.encode())
            + _u32(self.FLAG_WRITE | self.FLAG_CREAT | self.FLAG_TRUNC)
            + _u32(0),
        )
        if resp[0] != self.FXP_HANDLE:
            self._check_status(resp)
            raise SSHError("SFTP OPEN returned no handle")
        return _Reader(resp[5:]).string()

    def write(self, handle: bytes, data: bytes, chunk: int = 24576) -> None:
        off = 0
        while off < len(data):
            part = data[off:off + chunk]
            resp = self._req(
                self.FXP_WRITE, _s(handle) + _u64(off) + _s(part)
            )
            self._check_status(resp)
            off += len(part)

    def close_handle(self, handle: bytes) -> None:
        self._check_status(self._req(self.FXP_CLOSE, _s(handle)))

    def put_bytes(self, path: str, data: bytes) -> None:
        h = self.open_write(path)
        try:
            self.write(h, data)
        finally:
            self.close_handle(h)

    def close(self) -> None:
        try:
            self.t.send_packet(
                bytes([MSG_CHANNEL_CLOSE]) + _u32(self.remote_id)
            )
        except Exception:
            pass
        self.t.close()


def sftp_connect(
    host: str, port: int, username: str, password: str,
    timeout_s: float = 30.0, expected_host_key: bytes | None = None,
) -> SFTPClient:
    sock = socket.create_connection((host, port), timeout=timeout_s)
    t = SSHTransport(sock, server=False, timeout_s=timeout_s)
    try:
        t.handshake(expected_host_key=expected_host_key)
        t.auth_password(username, password)
        return SFTPClient(t)
    except BaseException:
        t.close()
        raise
