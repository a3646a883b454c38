"""Pure-Python ROS1 bag ingestion: the reference's primary real-data input.

The reference consumes `sensor_msgs/PointCloud2` clouds carrying
`vel_point::PointXYZIRT` points (x y z intensity ring time — reference
include/lidar.h:15-32) plus a `sensor_msgs/Imu` orientation stream from a
rosbag replay (src/laserProcessingNode.cpp:201-204, README.md:59-67).
This module reads ROS1 v2.0 bag files directly — record/chunk framing,
bz2/uncompressed chunks, connection records, and hand-rolled little-endian
deserializers for exactly the two message types the pipeline needs — with
no ROS installation, so recorded sequences feed `bin_to_ring_scan(rings=,
times=)` and `Pipeline.add_imu` unchanged.

Also provides a minimal BagWriter (same subset) used to build test
fixtures and to let users re-containerize npz/PCD sequences for replay.

Format reference: the ROS1 bag v2.0 container layout (public spec):
  magic "#ROSBAG V2.0\\n", then records of
  [u32 header_len][header fields][u32 data_len][data];
  header fields are [u32 len]["name=" value]; record type in the 'op'
  field (0x03 bag header, 0x05 chunk, 0x07 connection, 0x02 message,
  0x04 index, 0x06 chunk info). Chunks wrap connection+message records,
  optionally bz2-compressed.
"""
from __future__ import annotations

import bz2
import struct
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

_MAGIC = b"#ROSBAG V2.0\n"

_OP_MSG = 0x02
_OP_BAG_HEADER = 0x03
_OP_INDEX = 0x04
_OP_CHUNK = 0x05
_OP_CHUNK_INFO = 0x06
_OP_CONNECTION = 0x07

POINTCLOUD2_TYPE = "sensor_msgs/PointCloud2"
IMU_TYPE = "sensor_msgs/Imu"
# standard public md5s for the two message types (written into
# connection records so generated bags replay in stock ROS tools)
_MD5 = {POINTCLOUD2_TYPE: "1158d486dd51d683ce2f1be655c3c181",
        IMU_TYPE: "6a62c6daae103f4ff57a132d6f95cec2"}

_POINTFIELD_DTYPES = {1: np.int8, 2: np.uint8, 3: np.int16, 4: np.uint16,
                      5: np.int32, 6: np.uint32, 7: np.float32,
                      8: np.float64}
_POINTFIELD_CODES = {np.dtype(v): k for k, v in _POINTFIELD_DTYPES.items()}


# ----------------------------------------------------------------------
# record framing
# ----------------------------------------------------------------------

def _parse_header(buf: bytes) -> Dict[bytes, bytes]:
    fields = {}
    off = 0
    while off < len(buf):
        (ln,) = struct.unpack_from("<I", buf, off)
        off += 4
        eq = buf.index(b"=", off)
        fields[buf[off:eq]] = buf[eq + 1:off + ln]
        off += ln
    return fields


def _encode_header(fields: Dict[bytes, bytes]) -> bytes:
    out = b""
    for k, v in fields.items():
        item = k + b"=" + v
        out += struct.pack("<I", len(item)) + item
    return out


def _read_record(f) -> Optional[Tuple[Dict[bytes, bytes], bytes]]:
    hl = f.read(4)
    if len(hl) < 4:
        return None
    (hlen,) = struct.unpack("<I", hl)
    header = _parse_header(f.read(hlen))
    (dlen,) = struct.unpack("<I", f.read(4))
    return header, f.read(dlen)


def _iter_records(buf: bytes) -> Iterator[Tuple[Dict[bytes, bytes], bytes]]:
    off = 0
    while off + 4 <= len(buf):
        (hlen,) = struct.unpack_from("<I", buf, off)
        header = _parse_header(buf[off + 4:off + 4 + hlen])
        off += 4 + hlen
        (dlen,) = struct.unpack_from("<I", buf, off)
        off += 4
        yield header, buf[off:off + dlen]
        off += dlen


def _stamp(header: Dict[bytes, bytes]) -> float:
    sec, nsec = struct.unpack("<II", header[b"time"])
    return sec + nsec * 1e-9


# ----------------------------------------------------------------------
# message deserializers (little-endian ROS1 serialization)
# ----------------------------------------------------------------------

def _read_string(buf: bytes, off: int) -> Tuple[str, int]:
    (ln,) = struct.unpack_from("<I", buf, off)
    off += 4
    return buf[off:off + ln].decode(errors="replace"), off + ln


def _read_ros_header(buf: bytes, off: int) -> Tuple[float, str, int]:
    _seq, sec, nsec = struct.unpack_from("<III", buf, off)
    off += 12
    frame_id, off = _read_string(buf, off)
    return sec + nsec * 1e-9, frame_id, off


def parse_pointcloud2(data: bytes) -> dict:
    """sensor_msgs/PointCloud2 -> dict(stamp, frame_id, height, width,
    fields{name: (offset, np dtype, count)}, point_step, data bytes)."""
    stamp, frame_id, off = _read_ros_header(data, 0)
    height, width = struct.unpack_from("<II", data, off)
    off += 8
    (nfields,) = struct.unpack_from("<I", data, off)
    off += 4
    fields = {}
    for _ in range(nfields):
        name, off = _read_string(data, off)
        f_off, dt, cnt = struct.unpack_from("<IBI", data, off)
        off += 9
        fields[name] = (f_off, np.dtype(_POINTFIELD_DTYPES[dt]), cnt)
    is_bigendian, = struct.unpack_from("<B", data, off)
    off += 1
    point_step, _row_step = struct.unpack_from("<II", data, off)
    off += 8
    (dlen,) = struct.unpack_from("<I", data, off)
    off += 4
    body = data[off:off + dlen]
    if is_bigendian:
        raise ValueError("big-endian PointCloud2 not supported")
    return dict(stamp=stamp, frame_id=frame_id, height=height, width=width,
                fields=fields, point_step=point_step, data=body)


def cloud_field(msg: dict, name: str) -> Optional[np.ndarray]:
    """Extract one per-point field as a flat array via a strided view."""
    if name not in msg["fields"]:
        return None
    f_off, dtype, _ = msg["fields"][name]
    n = len(msg["data"]) // msg["point_step"]
    return np.ndarray(buffer=msg["data"], dtype=dtype, shape=(n,),
                      offset=f_off, strides=(msg["point_step"],)).copy()


def parse_imu(data: bytes) -> dict:
    """sensor_msgs/Imu -> dict(stamp, orientation wxyz, angular_velocity,
    linear_acceleration)."""
    stamp, frame_id, off = _read_ros_header(data, 0)
    vals = struct.unpack_from("<4d", data, off)  # x y z w
    off += 32 + 72  # orientation + its covariance
    gyro = struct.unpack_from("<3d", data, off)
    off += 24 + 72
    accel = struct.unpack_from("<3d", data, off)
    return dict(stamp=stamp, frame_id=frame_id,
                orientation_wxyz=np.array([vals[3], vals[0], vals[1],
                                           vals[2]]),
                angular_velocity=np.array(gyro),
                linear_acceleration=np.array(accel))


# ----------------------------------------------------------------------
# reader
# ----------------------------------------------------------------------

class BagReader:
    """Streams (topic, msg_type, record_stamp, raw_message_bytes) from a
    ROS1 v2.0 bag in file order (chunked or bare records; none/bz2
    compression)."""

    def __init__(self, path):
        self.path = Path(path)

    def messages(self, topics: Optional[set] = None
                 ) -> Iterator[Tuple[str, str, float, bytes]]:
        conns: Dict[int, Tuple[str, str]] = {}  # conn id -> (topic, type)

        def handle(header, data):
            op = header[b"op"][0]
            if op == _OP_CONNECTION:
                (cid,) = struct.unpack("<I", header[b"conn"])
                ch = _parse_header(data)
                conns[cid] = (ch.get(b"topic", header.get(b"topic", b"")
                                     ).decode(),
                              ch.get(b"type", b"").decode())
            elif op == _OP_MSG:
                (cid,) = struct.unpack("<I", header[b"conn"])
                topic, mtype = conns.get(cid, ("?", "?"))
                if topics is None or topic in topics:
                    return topic, mtype, _stamp(header), data
            return None

        with open(self.path, "rb") as f:
            if f.read(len(_MAGIC)) != _MAGIC:
                raise ValueError(f"{self.path}: not a ROS1 v2.0 bag")
            while True:
                rec = _read_record(f)
                if rec is None:
                    return
                header, data = rec
                op = header[b"op"][0]
                if op == _OP_CHUNK:
                    comp = header.get(b"compression", b"none")
                    if comp == b"bz2":
                        data = bz2.decompress(data)
                    elif comp == b"lz4":
                        try:
                            import lz4.frame  # optional

                            data = lz4.frame.decompress(data)
                        except ImportError as e:
                            raise ValueError(
                                "lz4-compressed bag needs the lz4 package; "
                                "re-record with bz2/none compression") from e
                    elif comp != b"none":
                        raise ValueError(f"unknown compression {comp!r}")
                    for h2, d2 in _iter_records(data):
                        out = handle(h2, d2)
                        if out is not None:
                            yield out
                elif op in (_OP_BAG_HEADER, _OP_INDEX, _OP_CHUNK_INFO):
                    continue
                else:
                    out = handle(header, data)
                    if out is not None:
                        yield out


class RosbagSource:
    """High-level event stream for the SLAM pipeline: yields, in bag
    order, ('imu', stamp, orientation_wxyz) and ('scan', stamp, cloud)
    events, where cloud is a dict of per-point arrays (xyz, intensity,
    ring, time) — exactly the reference's two subscriptions
    (laserProcessingNode.cpp:201-204). Topics are auto-detected from
    connection message types when not given."""

    def __init__(self, path, cloud_topic: Optional[str] = None,
                 imu_topic: Optional[str] = None):
        self.path = Path(path)
        self.cloud_topic = cloud_topic
        self.imu_topic = imu_topic

    def __iter__(self):
        for topic, mtype, stamp, raw in BagReader(self.path).messages():
            if mtype == POINTCLOUD2_TYPE and (self.cloud_topic is None or
                                              topic == self.cloud_topic):
                msg = parse_pointcloud2(raw)
                n = len(msg["data"]) // msg["point_step"] \
                    if msg["point_step"] else 0
                if n == 0:
                    continue
                xyz = np.stack([cloud_field(msg, c) for c in "xyz"],
                               axis=1).astype(np.float32)
                inten = cloud_field(msg, "intensity")
                ring = cloud_field(msg, "ring")
                t = cloud_field(msg, "time")
                yield ("scan", msg["stamp"], dict(
                    xyz=xyz,
                    intensity=None if inten is None
                    else inten.astype(np.float32),
                    ring=None if ring is None else ring.astype(np.int32),
                    time=None if t is None else t.astype(np.float32)))
            elif mtype == IMU_TYPE and (self.imu_topic is None or
                                        topic == self.imu_topic):
                msg = parse_imu(raw)
                yield ("imu", msg["stamp"], msg["orientation_wxyz"])


# ----------------------------------------------------------------------
# writer (fixtures + re-containerizing recorded sequences)
# ----------------------------------------------------------------------

class BagWriter:
    """Minimal ROS1 v2.0 bag writer for the PointXYZIRT + Imu subset: one
    uncompressed (or bz2) chunk holding connection + message records, no
    index (every reader that streams in file order — including BagReader
    above and `rosbag play`'s reindex path — accepts this)."""

    def __init__(self, path, compression: str = "none"):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        if compression not in ("none", "bz2"):
            raise ValueError("compression must be 'none' or 'bz2'")
        self.compression = compression
        self._chunk: List[bytes] = []
        self._conns: Dict[str, int] = {}
        self._conn_types: Dict[str, str] = {}
        self._closed = False

    @staticmethod
    def _record(fields: Dict[bytes, bytes], data: bytes) -> bytes:
        h = _encode_header(fields)
        return struct.pack("<I", len(h)) + h + \
            struct.pack("<I", len(data)) + data

    def _connection(self, topic: str, mtype: str) -> int:
        if topic in self._conns:
            return self._conns[topic]
        cid = len(self._conns)
        self._conns[topic] = cid
        self._conn_types[topic] = mtype
        conn_header = _encode_header({
            b"topic": topic.encode(),
            b"type": mtype.encode(),
            b"md5sum": _MD5.get(mtype, "*").encode(),
            b"message_definition": b"",
            b"callerid": b"floam_tpu",
        })
        self._chunk.append(self._record(
            {b"op": bytes([_OP_CONNECTION]),
             b"conn": struct.pack("<I", cid),
             b"topic": topic.encode()}, conn_header))
        return cid

    def _message(self, topic: str, mtype: str, stamp: float,
                 body: bytes) -> None:
        if self._closed:
            raise ValueError("bag already closed")
        cid = self._connection(topic, mtype)
        sec = int(stamp)
        nsec = int(round((stamp - sec) * 1e9))
        self._chunk.append(self._record(
            {b"op": bytes([_OP_MSG]), b"conn": struct.pack("<I", cid),
             b"time": struct.pack("<II", sec, nsec)}, body))

    @staticmethod
    def _ros_header(stamp: float, frame_id: str, seq: int = 0) -> bytes:
        sec = int(stamp)
        nsec = int(round((stamp - sec) * 1e9))
        fid = frame_id.encode()
        return struct.pack("<III", seq, sec, nsec) + \
            struct.pack("<I", len(fid)) + fid

    def write_cloud_xyzirt(self, topic: str, stamp: float, xyz: np.ndarray,
                           intensity: np.ndarray, ring: np.ndarray,
                           time_: np.ndarray,
                           frame_id: str = "velodyne") -> None:
        """One PointCloud2 of vel_point::PointXYZIRT points (the padded
        16+4+2+pad+4 = 32-byte PCL layout, reference lidar.h:15-32)."""
        n = len(xyz)
        rec = np.zeros(n, dtype=np.dtype({
            "names": ["x", "y", "z", "intensity", "ring", "time"],
            "formats": [np.float32] * 4 + [np.uint16, np.float32],
            "offsets": [0, 4, 8, 16, 20, 24], "itemsize": 32}))
        rec["x"], rec["y"], rec["z"] = (np.asarray(xyz[:, k], np.float32)
                                        for k in range(3))
        rec["intensity"] = np.asarray(intensity, np.float32)
        rec["ring"] = np.asarray(ring, np.uint16)
        rec["time"] = np.asarray(time_, np.float32)
        body = rec.tobytes()

        fields = [("x", 0, np.float32), ("y", 4, np.float32),
                  ("z", 8, np.float32), ("intensity", 16, np.float32),
                  ("ring", 20, np.uint16), ("time", 24, np.float32)]
        buf = [self._ros_header(stamp, frame_id)]
        buf.append(struct.pack("<II", 1, n))  # height, width
        buf.append(struct.pack("<I", len(fields)))
        for name, off, dt in fields:
            nm = name.encode()
            buf.append(struct.pack("<I", len(nm)) + nm)
            buf.append(struct.pack("<IBI", off,
                                   _POINTFIELD_CODES[np.dtype(dt)], 1))
        buf.append(struct.pack("<BII", 0, 32, 32 * n))  # LE, steps
        buf.append(struct.pack("<I", len(body)) + body)
        buf.append(struct.pack("<B", 1))  # is_dense
        self._message(topic, POINTCLOUD2_TYPE, stamp, b"".join(buf))

    def write_imu(self, topic: str, stamp: float,
                  orientation_wxyz: np.ndarray,
                  angular_velocity=(0.0, 0.0, 0.0),
                  linear_acceleration=(0.0, 0.0, 0.0),
                  frame_id: str = "imu") -> None:
        q = np.asarray(orientation_wxyz, np.float64)
        cov = struct.pack("<9d", *([0.0] * 9))
        body = (self._ros_header(stamp, frame_id)
                + struct.pack("<4d", q[1], q[2], q[3], q[0]) + cov
                + struct.pack("<3d", *angular_velocity) + cov
                + struct.pack("<3d", *linear_acceleration) + cov)
        self._message(topic, IMU_TYPE, stamp, body)

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        chunk = b"".join(self._chunk)
        payload = bz2.compress(chunk) if self.compression == "bz2" \
            else chunk
        chunk_rec = self._record(
            {b"op": bytes([_OP_CHUNK]),
             b"compression": self.compression.encode(),
             b"size": struct.pack("<I", len(chunk))}, payload)
        with open(self.path, "wb") as f:
            f.write(_MAGIC)
            bag_header = _encode_header({
                b"op": bytes([_OP_BAG_HEADER]),
                b"index_pos": struct.pack("<Q", 0),
                b"conn_count": struct.pack("<I", len(self._conns)),
                b"chunk_count": struct.pack("<I", 1)})
            # the bag header record is padded to 4096 bytes total
            pad = 4096 - 4 - len(bag_header) - 4
            f.write(struct.pack("<I", len(bag_header)) + bag_header)
            f.write(struct.pack("<I", pad) + b" " * pad)
            f.write(chunk_rec)
