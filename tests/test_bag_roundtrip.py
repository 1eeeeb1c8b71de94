"""Round-trip test for the ROS1 bag converter (tools/bag_to_npz.py).

The Tier-3 north-star regression gates on a converted real bag
(short_test3.bag, test/CMakeLists.txt:120-168 in the reference), but
this image has no network — so the converter's hand-rolled ROS1 v2.0
bag parsing had never touched a real bag.  This test writes a minimal
but format-faithful ROS1 v2.0 bag (bz2-compressed chunk, connection
records, message records for all four consumed message types —
PointCloud2 with field sniffing + padding, Odometry, Imu, TFMessage
static and dynamic) and round-trips it through the converter CLI,
checking the decoded values and the TF chain resolution numerically.

Format reference: http://wiki.ros.org/Bags/Format/2.0 (implemented
from the spec, not from ROS code).
"""

import bz2
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np

from mcl_3dl_tpu.math import quat_np as mq

REPO = Path(__file__).resolve().parent.parent

ODOM, IMU, CLOUD = 0, 1, 2


# ------------------------------------------------------------ bag writing


def _header(fields: dict) -> bytes:
    out = b""
    for name, value in fields.items():
        item = name.encode() + b"=" + value
        out += struct.pack("<I", len(item)) + item
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _time(t: float) -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return struct.pack("<Q", secs | (nsecs << 32))


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ros_header(stamp: float, frame: str, seq: int = 0) -> bytes:
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    return struct.pack("<III", seq, secs, nsecs) + _string(frame)


def _msg_tf(transforms) -> bytes:
    out = struct.pack("<I", len(transforms))
    for stamp, parent, child, t, q in transforms:
        out += _ros_header(stamp, parent)
        out += _string(child)
        out += struct.pack("<3d", *t) + struct.pack("<4d", *q)
    return out


def _msg_odometry(stamp, frame, child, pos, rot) -> bytes:
    out = _ros_header(stamp, frame) + _string(child)
    out += struct.pack("<7d", *pos, *rot)
    out += struct.pack("<36d", *([0.0] * 36))        # pose covariance
    out += struct.pack("<6d", *([0.0] * 6))          # twist
    out += struct.pack("<36d", *([0.0] * 36))        # twist covariance
    return out


def _msg_imu(stamp, frame, quat, acc) -> bytes:
    out = _ros_header(stamp, frame)
    out += struct.pack("<4d", *quat)
    out += struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", 0.0, 0.0, 0.0)         # angular velocity
    out += struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *acc)
    out += struct.pack("<9d", *([0.0] * 9))
    return out


def _msg_pointcloud2(stamp, frame, pts, fields, point_step,
                     extra_cols=None) -> bytes:
    """fields: list of (name, offset, datatype, count)."""
    n = len(pts)
    raw = bytearray(n * point_step)
    dt_map = {7: "<f", 6: "<I"}
    cols = dict(extra_cols or {})
    cols.update({"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]})
    for name, offset, datatype, _count in fields:
        col = cols.get(name)
        if col is None:
            continue
        fmt = dt_map[datatype]
        for i, v in enumerate(col):
            struct.pack_into(fmt, raw, i * point_step + offset,
                             v if datatype != 6 else int(v))
    out = _ros_header(stamp, frame)
    out += struct.pack("<II", 1, n)                  # height, width
    out += struct.pack("<I", len(fields))
    for name, offset, datatype, count in fields:
        out += _string(name) + struct.pack("<IBI", offset, datatype, count)
    out += struct.pack("<B", 0)                      # is_bigendian
    out += struct.pack("<II", point_step, point_step * n)
    out += struct.pack("<I", len(raw)) + bytes(raw)
    out += struct.pack("<B", 1)                      # is_dense
    return out


def _connection(conn_id, topic, msgtype) -> bytes:
    conn_hdr = _header({
        "topic": topic.encode(),
        "type": msgtype.encode(),
        "md5sum": b"0" * 32,
        "message_definition": b"",
    })
    return _record(
        {"op": b"\x07", "conn": struct.pack("<I", conn_id),
         "topic": topic.encode()},
        conn_hdr,
    )


def _message(conn_id, stamp, data) -> bytes:
    return _record(
        {"op": b"\x02", "conn": struct.pack("<I", conn_id),
         "time": _time(stamp)},
        data,
    )


def write_bag(path, records_in_chunk, compression="bz2"):
    """#ROSBAG V2.0 file: bag header record, one chunk holding
    ``records_in_chunk`` (concatenated connection/message records),
    then a chunk-info record (skipped by readers that replay chunks)."""
    chunk_payload = b"".join(records_in_chunk)
    comp = bz2.compress(chunk_payload) if compression == "bz2" \
        else chunk_payload
    bag = b"#ROSBAG V2.0\n"
    bag += _record(
        {"op": b"\x03", "index_pos": struct.pack("<Q", 0),
         "conn_count": struct.pack("<I", 0),
         "chunk_count": struct.pack("<I", 1)},
        b" " * 4096,                                 # header padding
    )
    bag += _record(
        {"op": b"\x05", "compression": compression.encode(),
         "size": struct.pack("<I", len(chunk_payload))},
        comp,
    )
    bag += _record(
        {"op": b"\x06", "ver": struct.pack("<I", 1),
         "chunk_pos": struct.pack("<Q", 0),
         "start_time": _time(0.0), "end_time": _time(100.0),
         "count": struct.pack("<I", len(records_in_chunk))},
        b"",
    )
    Path(path).write_bytes(bag)


# --------------------------------------------------------------- the test


def test_bag_roundtrip(tmp_path):
    t0 = 1000.0
    # static TF: laser and imu_link mounted on base_link
    q_laser = np.asarray(mq.from_rpy(np.asarray([0.0, 0.0, np.pi / 2])),
                         np.float64)
    t_laser = np.asarray([0.1, 0.0, 0.5])
    q_imu = np.asarray(mq.from_rpy(np.asarray([0.0, np.pi, 0.0])),
                       np.float64)
    # dynamic TF odom -> base_link
    q_base = np.asarray(mq.from_rpy(np.asarray([0.0, 0.0, 0.3])), np.float64)
    t_base = np.asarray([1.0, -2.0, 0.0])

    scan = np.asarray([[1.0, 0.0, 0.0],
                       [2.0, 1.0, -0.5],
                       [np.nan, 0.0, 0.0],          # dropped (finite filter)
                       [0.5, -0.25, 0.25]], np.float64)
    intens = np.asarray([1.0, 2.0, 3.0, 4.0])
    labels = np.asarray([0, 1, 2, 3])
    mappts = np.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
                         [2.0, 0.5, 0.25]], np.float64)
    odom_pos = np.asarray([1.0, -2.0, 0.0])
    odom_rot = q_base
    imu_quat = np.asarray(mq.from_rpy(np.asarray([0.05, -0.02, 1.2])),
                          np.float64)
    imu_acc = np.asarray([0.1, 0.2, 9.7])

    conns = {
        1: ("/tf_static", "tf2_msgs/TFMessage"),
        2: ("/tf", "tf2_msgs/TFMessage"),
        3: ("/odom", "nav_msgs/Odometry"),
        4: ("/imu/data", "sensor_msgs/Imu"),
        5: ("/cloud", "sensor_msgs/PointCloud2"),
        6: ("/mapcloud", "sensor_msgs/PointCloud2"),
    }
    records = [_connection(cid, top, typ)
               for cid, (top, typ) in conns.items()]

    records.append(_message(1, t0, _msg_tf([
        (t0, "base_link", "laser", t_laser, q_laser),
        (t0, "base_link", "imu_link", np.zeros(3), q_imu),
    ])))
    # dynamic TF written OUT of stamp order (chunked writers interleave);
    # the buffer must still pick the nearest sample by stamp
    records.append(_message(2, t0 + 0.5, _msg_tf([
        (t0 + 0.5, "odom", "base_link", t_base + 100.0, q_base),
    ])))
    records.append(_message(2, t0 + 0.1, _msg_tf([
        (t0 + 0.1, "odom", "base_link", t_base, q_base),
    ])))
    records.append(_message(3, t0 + 0.10,
                            _msg_odometry(t0 + 0.10, "odom", "base_link",
                                          odom_pos, odom_rot)))
    records.append(_message(4, t0 + 0.11,
                            _msg_imu(t0 + 0.11, "imu_link", imu_quat,
                                     imu_acc)))
    # scan: x/y/z/intensity float32 + label uint32, 4 bytes padding
    # before the label to exercise the strided field sniffing
    records.append(_message(5, t0 + 0.12, _msg_pointcloud2(
        t0 + 0.12, "laser", scan,
        fields=[("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
                ("intensity", 12, 7, 1), ("label", 20, 6, 1)],
        point_step=24, extra_cols={"intensity": intens, "label": labels},
    )))
    records.append(_message(6, t0 + 0.2, _msg_pointcloud2(
        t0 + 0.2, "map", mappts,
        fields=[("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1)],
        point_step=12,
    )))

    bag = tmp_path / "tiny.bag"
    out = tmp_path / "tiny.npz"
    write_bag(bag, records, compression="bz2")

    r = subprocess.run(
        [sys.executable, "tools/bag_to_npz.py", str(bag), str(out),
         "--cloud-topic", "/cloud"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    from mcl_3dl_tpu.io.replay import ReplayLog

    log = ReplayLog.load(out)
    kinds = np.asarray(log.kinds)
    assert list(kinds) == [ODOM, IMU, CLOUD]

    # odometry decoded exactly
    i_od = 0
    np.testing.assert_allclose(log.odom_pos[i_od], odom_pos, atol=1e-6)
    np.testing.assert_allclose(log.odom_rot[i_od], odom_rot, atol=1e-6)
    assert abs(log.times[i_od] - (t0 + 0.10)) < 1e-6

    # IMU: acceleration rotated into base_link via the static TF
    i_imu = 1
    acc_base = mq.rotate(q_imu, imu_acc)
    np.testing.assert_allclose(log.imu_acc[i_imu], acc_base, atol=1e-5)
    # orientation: axis rotated into base frame, angle preserved
    axis_len = np.linalg.norm(imu_quat[:3])
    axis_base = mq.rotate(q_imu, imu_quat[:3] / axis_len)
    expect_quat = np.concatenate([axis_base * axis_len, imu_quat[3:]])
    np.testing.assert_allclose(log.imu_rot[i_imu], expect_quat, atol=1e-5)

    # cloud: NaN point dropped; remaining points transformed
    # laser -> base_link -> odom with the stamp-NEAREST dynamic sample
    i_cl = 2
    n = int(log.cloud_len[i_cl])
    assert n == 3
    s = int(log.cloud_start[i_cl])
    got = np.asarray(log.cloud_points[s:s + n])
    finite = scan[np.isfinite(scan).all(axis=1)]
    in_base = np.stack([mq.rotate(q_laser, p) + t_laser for p in finite])
    in_odom = np.stack([mq.rotate(q_base, p) + t_base for p in in_base])
    np.testing.assert_allclose(got, in_odom, atol=1e-5)
    # sensor origin recorded in the odom frame
    org = mq.rotate(q_base, mq.rotate(np.array([0.0, 0, 0, 1.0]), t_laser)
                    ) + t_base
    np.testing.assert_allclose(log.cloud_origin[i_cl], org, atol=1e-5)

    # map decoded from the map topic
    np.testing.assert_allclose(np.asarray(log.map_points), mappts, atol=1e-6)


def test_bag_roundtrip_uncompressed(tmp_path):
    """Uncompressed chunk variant + multi-scan accumulation ordering."""
    t0 = 5.0
    records = [
        _connection(1, "/tf", "tf2_msgs/TFMessage"),
        _connection(2, "/cloud", "sensor_msgs/PointCloud2"),
    ]
    records.append(_message(1, t0, _msg_tf([
        (t0, "odom", "base_link", np.zeros(3), np.array([0, 0, 0, 1.0])),
        (t0, "base_link", "laser", np.zeros(3), np.array([0, 0, 0, 1.0])),
    ])))
    pts = [np.asarray([[float(k), 0.0, 0.0]]) for k in range(3)]
    for k in range(3):
        records.append(_message(2, t0 + 0.1 * k, _msg_pointcloud2(
            t0 + 0.1 * k, "laser", pts[k],
            fields=[("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1)],
            point_step=12,
        )))
    bag = tmp_path / "plain.bag"
    out = tmp_path / "plain.npz"
    write_bag(bag, records, compression="none")
    r = subprocess.run(
        [sys.executable, "tools/bag_to_npz.py", str(bag), str(out),
         "--cloud-topic", "/cloud"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    from mcl_3dl_tpu.io.replay import ReplayLog

    log = ReplayLog.load(out)
    assert (np.asarray(log.kinds) == CLOUD).all() and len(log.kinds) == 3
    for k in range(3):
        s, n = int(log.cloud_start[k]), int(log.cloud_len[k])
        np.testing.assert_allclose(log.cloud_points[s:s + n], pts[k],
                                   atol=1e-6)
