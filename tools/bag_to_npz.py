#!/usr/bin/env python
"""Convert a ROS1 bag (e.g. short_test3.bag) into a ReplayLog npz.

Self-contained ROS1 bag format 2.0 reader — no ROS installation needed.
Handles the message types the reference node consumes
(src/mcl_3dl.cpp:1216-1249):

* ``sensor_msgs/PointCloud2``  (scan + map topics)
* ``nav_msgs/Odometry``
* ``sensor_msgs/Imu``
* ``tf2_msgs/TFMessage`` (+ ``/tf_static``) for the sensor->base_link
  and base_link->odom frames the node gets from TF.

Scans are transformed into the odom frame at their stamp (mirroring
accumCloud, src/mcl_3dl.cpp:274-302) with the sensor origin recorded,
so the replay driver can feed the engine without any TF stack.

Usage:
  python tools/bag_to_npz.py input.bag output.npz \
      [--cloud-topic /cloud] [--map-topic /mapcloud] [--max-points N]
"""

from __future__ import annotations

import argparse
import bz2
import struct
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


# ---------------------------------------------------------------- bag format


def _read_header(data):
    """Parse a bag record header into a dict of raw bytes fields."""
    fields = {}
    off = 0
    while off < len(data):
        (field_len,) = struct.unpack_from("<I", data, off)
        off += 4
        field = data[off:off + field_len]
        off += field_len
        name, _, value = field.partition(b"=")
        fields[name.decode()] = value
    return fields


def read_bag_records(path):
    """Yields (connection_header_or_None, op, header, data) records,
    decompressing chunks transparently."""
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#ROSBAG V2.0"):
            raise ValueError(f"not a ROS1 v2.0 bag: {magic!r}")
        payload = f.read()

    connections = {}
    messages = []

    def parse_stream(buf):
        off = 0
        while off < len(buf):
            (hlen,) = struct.unpack_from("<I", buf, off)
            off += 4
            header = _read_header(buf[off:off + hlen])
            off += hlen
            (dlen,) = struct.unpack_from("<I", buf, off)
            off += 4
            data = buf[off:off + dlen]
            off += dlen
            op = header.get("op", b"\x00")[0]
            if op == 0x07:  # connection
                conn_id = struct.unpack("<I", header["conn"])[0]
                conn_hdr = _read_header(data)
                connections[conn_id] = {
                    "topic": header["topic"].decode(),
                    "type": conn_hdr.get(b"type", b"").decode()
                    if b"type" in conn_hdr else conn_hdr.get("type", b"").decode()
                    if "type" in conn_hdr else "",
                    "md5": "",
                }
                # _read_header returns str keys
                conn_hdr2 = _read_header(data)
                connections[conn_id]["type"] = conn_hdr2.get("type", b"").decode()
            elif op == 0x02:  # message data
                conn_id = struct.unpack("<I", header["conn"])[0]
                (t,) = struct.unpack("<Q", header["time"])
                secs, nsecs = t & 0xFFFFFFFF, t >> 32
                messages.append((conn_id, secs + 1e-9 * nsecs, data))
            elif op == 0x05:  # chunk
                compression = header.get("compression", b"none").decode()
                chunk = data
                if compression == "bz2":
                    chunk = bz2.decompress(chunk)
                elif compression == "lz4":
                    try:
                        import lz4.frame  # type: ignore
                        chunk = lz4.frame.decompress(chunk)
                    except ImportError:
                        raise RuntimeError("lz4-compressed bag needs lz4")
                parse_stream(chunk)
            # ops 0x03 (bag header), 0x04 (index), 0x06 (chunk info): skip

    parse_stream(payload)
    return connections, messages


# ------------------------------------------------------------- msg decoding


class Reader:
    def __init__(self, data):
        self.d = data
        self.o = 0

    def u32(self):
        (v,) = struct.unpack_from("<I", self.d, self.o)
        self.o += 4
        return v

    def u8(self):
        v = self.d[self.o]
        self.o += 1
        return v

    def f64(self, n=1):
        v = struct.unpack_from(f"<{n}d", self.d, self.o)
        self.o += 8 * n
        return v if n > 1 else v[0]

    def time(self):
        s = self.u32()
        ns = self.u32()
        return s + 1e-9 * ns

    def string(self):
        n = self.u32()
        v = self.d[self.o:self.o + n].decode("utf-8", "replace")
        self.o += n
        return v

    def skip(self, n):
        self.o += n

    def bytes(self, n):
        v = self.d[self.o:self.o + n]
        self.o += n
        return v


def decode_header(r):
    seq = r.u32()
    stamp = r.time()
    frame = r.string()
    return stamp, frame


def decode_odometry(data):
    r = Reader(data)
    stamp, frame = decode_header(r)
    child = r.string()
    pose = r.f64(7)
    return stamp, np.asarray(pose[:3]), np.asarray(pose[3:7])


def decode_imu(data):
    r = Reader(data)
    stamp, frame = decode_header(r)
    quat = np.asarray(r.f64(4))
    r.f64(9)  # orientation covariance
    r.f64(3)  # angular velocity
    r.f64(9)
    acc = np.asarray(r.f64(3))
    return stamp, frame, quat, acc


def decode_pointcloud2(data):
    r = Reader(data)
    stamp, frame = decode_header(r)
    height = r.u32()
    width = r.u32()
    nfields = r.u32()
    fields = []
    for _ in range(nfields):
        name = r.string()
        offset = r.u32()
        datatype = r.u8()
        count = r.u32()
        fields.append((name, offset, datatype, count))
    _bigendian = r.u8()
    point_step = r.u32()
    _row_step = r.u32()
    nbytes = r.u32()
    raw = r.bytes(nbytes)

    n = (height * width) if point_step == 0 else nbytes // point_step
    dt_map = {7: "<f4", 8: "<f8", 2: "<u1", 4: "<u2", 6: "<u4",
              1: "<i1", 3: "<i2", 5: "<i4"}
    cols = {}
    for name, offset, datatype, count in fields:
        if name not in ("x", "y", "z", "intensity", "label"):
            continue
        dt = np.dtype(dt_map[datatype])
        col = np.ndarray(
            (n,), dt, buffer=raw, offset=offset, strides=(point_step,)
        ).copy()
        cols[name] = col
    pts = np.stack(
        [cols["x"].astype(np.float32), cols["y"].astype(np.float32),
         cols["z"].astype(np.float32)], axis=1,
    )
    finite = np.isfinite(pts).all(axis=1)
    return stamp, frame, pts[finite]


def decode_tf(data):
    r = Reader(data)
    n = r.u32()
    out = []
    for _ in range(n):
        stamp, frame = decode_header(r)
        child = r.string()
        t = np.asarray(r.f64(3))
        q = np.asarray(r.f64(4))
        out.append((stamp, frame.lstrip("/"), child.lstrip("/"), t, q))
    return out


# ------------------------------------------------------------ TF resolution


def quat_mul(a, b):
    x1, y1, z1, w1 = a
    x2, y2, z2, w2 = b
    return np.asarray([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
        w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])


def quat_rot(q, v):
    u = q[:3]
    uv = np.cross(u, v)
    return v + 2.0 * (q[3] * uv + np.cross(u, uv))


def quat_inv(q):
    return np.asarray([-q[0], -q[1], -q[2], q[3]]) / np.dot(q, q)


class TfBuffer:
    """Tiny TF buffer: per (parent, child) time-indexed transforms with
    nearest-sample lookup, plus static transforms."""

    def __init__(self):
        self.dynamic = defaultdict(lambda: ([], [], []))  # t, trans, quat
        self.static = {}
        self.parent_of = {}

    def add(self, stamp, parent, child, t, q, is_static=False):
        self.parent_of[child] = parent
        if is_static:
            self.static[(parent, child)] = (t, q)
        else:
            ts, tr, qu = self.dynamic[(parent, child)]
            ts.append(stamp)
            tr.append(t)
            qu.append(q)

    def finalize(self):
        """Sort each dynamic series by stamp: bag records are only
        approximately time-ordered (chunked writers interleave), and
        ``get`` uses searchsorted."""
        for key, (ts, tr, qu) in self.dynamic.items():
            order = np.argsort(ts, kind="stable")
            self.dynamic[key] = (
                [ts[i] for i in order],
                [tr[i] for i in order],
                [qu[i] for i in order],
            )

    def get(self, parent, child, stamp):
        if (parent, child) in self.static:
            return self.static[(parent, child)]
        ts, tr, qu = self.dynamic.get((parent, child), ([], [], []))
        if not ts:
            return None
        i = int(np.clip(np.searchsorted(ts, stamp), 1, len(ts) - 1))
        # nearest of i-1, i
        if abs(ts[i - 1] - stamp) <= abs(ts[i] - stamp):
            i = i - 1
        return tr[i], qu[i]

    def chain(self, target, source, stamp):
        """Transform chain target <- ... <- source (walking parents)."""
        # build source -> root path composed
        t_acc = np.zeros(3)
        q_acc = np.asarray([0.0, 0.0, 0.0, 1.0])
        frame = source
        hops = 0
        while frame != target:
            parent = self.parent_of.get(frame)
            if parent is None or hops > 16:
                return None
            tq = self.get(parent, frame, stamp)
            if tq is None:
                return None
            t, q = tq
            t_acc = quat_rot(q, t_acc) + t
            q_acc = quat_mul(q, q_acc)
            frame = parent
            hops += 1
        return t_acc, q_acc


# ------------------------------------------------------------------- main


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("out")
    ap.add_argument("--cloud-topic", default=None,
                    help="scan topic(s), comma separated (default: sniff)")
    ap.add_argument("--map-topic", default="/mapcloud")
    ap.add_argument("--odom-topic", default="/odom")
    ap.add_argument("--imu-topic", default="/imu/data")
    ap.add_argument("--odom-frame", default="odom")
    ap.add_argument("--base-frame", default="base_link")
    ap.add_argument("--max-points", type=int, default=0,
                    help="random-subsample each scan to at most N points")
    args = ap.parse_args()

    from mcl_3dl_tpu.io.replay import CLOUD, IMU, ODOM, ReplayLog

    connections, messages = read_bag_records(args.bag)
    print(f"{len(connections)} connections, {len(messages)} messages")
    for cid, c in sorted(connections.items()):
        print(f"  conn {cid}: {c['topic']} [{c['type']}]")

    topic_of = {cid: c["topic"] for cid, c in connections.items()}
    type_of = {cid: c["type"] for cid, c in connections.items()}

    # pass 1: TF
    tfbuf = TfBuffer()
    for cid, t, data in messages:
        if type_of[cid] == "tf2_msgs/TFMessage" or topic_of[cid] in (
                "/tf", "/tf_static"):
            for stamp, parent, child, tr, qu in decode_tf(data):
                tfbuf.add(stamp, parent, child, tr, qu,
                          is_static=topic_of[cid] == "/tf_static")
    tfbuf.finalize()

    cloud_topics = (args.cloud_topic.split(",") if args.cloud_topic else None)

    rng = np.random.default_rng(0)
    times, kinds = [], []
    odom_pos, odom_rot, imu_acc, imu_rot = [], [], [], []
    cloud_start, cloud_len, cloud_origin, cloud_frame = [], [], [], []
    cloud_points = []
    frames = {}
    map_points = None
    total = 0
    skipped_tf = 0

    for cid, t_recv, data in sorted(messages, key=lambda m: m[1]):
        topic, typ = topic_of[cid], type_of[cid]
        if topic == args.map_topic and typ == "sensor_msgs/PointCloud2":
            _, _, pts = decode_pointcloud2(data)
            map_points = pts
            continue
        if typ == "nav_msgs/Odometry" and topic == args.odom_topic:
            stamp, pos, rot = decode_odometry(data)
            times.append(stamp); kinds.append(ODOM)
            odom_pos.append(pos); odom_rot.append(rot)
            imu_acc.append(np.zeros(3)); imu_rot.append(np.zeros(4))
            cloud_start.append(0); cloud_len.append(0)
            cloud_origin.append(np.zeros(3)); cloud_frame.append(0)
        elif typ == "sensor_msgs/Imu" and topic == args.imu_topic:
            stamp, frame, quat, acc = decode_imu(data)
            # rotate into base frame via static TF if present
            st = tfbuf.chain(args.base_frame, frame, stamp)
            if st is not None:
                _, q = st
                acc = quat_rot(q, acc)
                axis_len = np.linalg.norm(quat[:3])
                if axis_len > 1e-9:
                    axis = quat_rot(q, quat[:3] / axis_len)
                    quat = np.concatenate([axis * axis_len, quat[3:]])
            times.append(stamp); kinds.append(IMU)
            odom_pos.append(np.zeros(3)); odom_rot.append(np.zeros(4))
            imu_acc.append(acc); imu_rot.append(quat)
            cloud_start.append(0); cloud_len.append(0)
            cloud_origin.append(np.zeros(3)); cloud_frame.append(0)
        elif typ == "sensor_msgs/PointCloud2" and (
                cloud_topics is None or topic in cloud_topics):
            if topic == args.map_topic:
                continue
            stamp, frame, pts = decode_pointcloud2(data)
            tq = tfbuf.chain(args.odom_frame, frame, stamp)
            if tq is None:
                skipped_tf += 1
                continue
            tr, qu = tq
            pts_odom = quat_rot(qu, pts.astype(np.float64)) + tr
            if args.max_points and len(pts_odom) > args.max_points:
                idx = rng.choice(len(pts_odom), args.max_points, replace=False)
                pts_odom = pts_odom[idx]
            fid = frames.setdefault(frame, len(frames))
            times.append(stamp); kinds.append(CLOUD)
            odom_pos.append(np.zeros(3)); odom_rot.append(np.zeros(4))
            imu_acc.append(np.zeros(3)); imu_rot.append(np.zeros(4))
            cloud_start.append(total); cloud_len.append(len(pts_odom))
            cloud_origin.append(tr); cloud_frame.append(fid)
            cloud_points.append(pts_odom.astype(np.float32))
            total += len(pts_odom)

    if skipped_tf:
        print(f"skipped {skipped_tf} clouds without TF")
    log = ReplayLog(
        times=np.asarray(times), kinds=np.asarray(kinds, np.uint8),
        odom_pos=np.asarray(odom_pos, np.float32),
        odom_rot=np.asarray(odom_rot, np.float32),
        imu_acc=np.asarray(imu_acc, np.float32),
        imu_rot=np.asarray(imu_rot, np.float32),
        cloud_start=np.asarray(cloud_start, np.int64),
        cloud_len=np.asarray(cloud_len, np.int64),
        cloud_origin=np.asarray(cloud_origin, np.float32),
        cloud_frame=np.asarray(cloud_frame, np.uint16),
        cloud_points=(np.concatenate(cloud_points, axis=0)
                      if cloud_points else np.zeros((0, 3), np.float32)),
        map_points=(map_points if map_points is not None
                    else np.zeros((0, 3), np.float32)),
    )
    log.save(args.out)
    print(f"wrote {args.out}: {len(times)} events, {total} cloud points, "
          f"map={0 if map_points is None else len(map_points)} points")


if __name__ == "__main__":
    main()
