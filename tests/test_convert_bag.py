"""Converter test: build a minimal ROS bag 2.0 byte-for-byte (no ROS), run
``scripts/convert_bag.py`` on it, and replay the result through
``io.dataset.Sequence`` — the real-data on-ramp the reference exercises with
``rosbag play`` (README.md:146-186)."""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "scripts"))

import convert_bag  # noqa: E402


# ------------------------------------------------------------ bag authoring

def _fields(d: dict) -> bytes:
    out = b""
    for k, v in d.items():
        entry = k.encode() + b"=" + v
        out += struct.pack("<I", len(entry)) + entry
    return out


def _rec(header: dict, data: bytes) -> bytes:
    h = _fields(header)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _conn_rec(conn: int, topic: str, mtype: str) -> bytes:
    sub = _fields({"topic": topic.encode(), "type": mtype.encode(),
                   "md5sum": b"0" * 32, "message_definition": b""})
    return _rec({"op": b"\x07", "conn": struct.pack("<I", conn),
                 "topic": topic.encode()}, sub)


def _msg_rec(conn: int, t: float, payload: bytes) -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return _rec({"op": b"\x02", "conn": struct.pack("<I", conn),
                 "time": struct.pack("<II", secs, nsecs)}, payload)


def _ros_header(t: float, frame: bytes = b"body") -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return (struct.pack("<I", 0) + struct.pack("<II", secs, nsecs)
            + struct.pack("<I", len(frame)) + frame)


def _imu_msg(t, acc, gyr) -> bytes:
    return (_ros_header(t) + struct.pack("<4d", 0, 0, 0, 1)
            + struct.pack("<9d", *([0.0] * 9))
            + struct.pack("<3d", *gyr) + struct.pack("<9d", *([0.0] * 9))
            + struct.pack("<3d", *acc) + struct.pack("<9d", *([0.0] * 9)))


def _odom_msg(t, lin, ang) -> bytes:
    child = b"base"
    return (_ros_header(t) + struct.pack("<I", len(child)) + child
            + struct.pack("<7d", *([0.0] * 6), 1.0)
            + struct.pack("<36d", *([0.0] * 36))
            + struct.pack("<3d", *lin) + struct.pack("<3d", *ang))


def _image_msg(t, img: np.ndarray, enc: str) -> bytes:
    h, w = img.shape
    if enc == "mono8":
        data = img.astype(np.uint8).tobytes()
        step = w
    elif enc == "16UC1":
        data = img.astype(np.uint16).tobytes()
        step = 2 * w
    else:
        raise ValueError(enc)
    e = enc.encode()
    return (_ros_header(t) + struct.pack("<II", h, w)
            + struct.pack("<I", len(e)) + e + b"\x00" + struct.pack("<I", step)
            + struct.pack("<I", len(data)) + data)


def _navsat_msg(t, lat, lon, alt) -> bytes:
    return (_ros_header(t) + b"\x00" + struct.pack("<H", 1)
            + struct.pack("<3d", lat, lon, alt)
            + struct.pack("<9d", 4.0, 0, 0, 0, 4.0, 0, 0, 0, 9.0) + b"\x02")


def _write_mini_bag(path: str, n_frames: int = 3):
    conns = (_conn_rec(0, "/imu", "sensor_msgs/Imu")
             + _conn_rec(1, "/odom", "nav_msgs/Odometry")
             + _conn_rec(2, "/cam/color", "sensor_msgs/Image")
             + _conn_rec(3, "/cam/depth", "sensor_msgs/Image")
             + _conn_rec(4, "/gps", "sensor_msgs/NavSatFix"))
    msgs = b""
    rng = np.random.default_rng(0)
    for k in range(n_frames * 10):
        t = 0.01 * k
        msgs += _msg_rec(0, t, _imu_msg(t, (0.1, -0.2, 9.8), (0.01, 0.02, -0.03)))
    for k in range(n_frames * 5):
        t = 0.02 * k
        msgs += _msg_rec(1, t, _odom_msg(t, (0.5, 0.0, 0.0), (0.0, 0.0, 0.1)))
    for k in range(n_frames):
        t = 0.1 * k
        img = rng.integers(0, 255, (8, 12)).astype(np.uint8)
        dep = (1000 + 100 * k) * np.ones((8, 12))
        msgs += _msg_rec(2, t, _image_msg(t, img, "mono8"))
        msgs += _msg_rec(3, t + 0.001, _image_msg(t + 0.001, dep, "16UC1"))
    msgs += _msg_rec(4, 0.05, _navsat_msg(0.05, 31.0, 121.4, 12.0))

    chunk_data = conns + msgs
    chunk = _rec({"op": b"\x05", "compression": b"none",
                  "size": struct.pack("<I", len(chunk_data))}, chunk_data)
    bag_header = _rec({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                       "conn_count": struct.pack("<I", 5),
                       "chunk_count": struct.pack("<I", 1)}, b"")
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n" + bag_header + chunk)


def test_convert_bag_roundtrip(tmp_path):
    bag = str(tmp_path / "mini.bag")
    out = str(tmp_path / "seq")
    _write_mini_bag(bag, n_frames=3)
    counts = convert_bag.convert(bag, out)
    assert counts["imu"] == 30
    assert counts["wheel"] == 15
    assert counts["frames"] == 3
    assert counts["depth"] == 3
    assert counts["gps"] == 1

    from ground_fusion_tpu.io.dataset import Sequence, load_image

    seq = Sequence.load(out)
    np.testing.assert_allclose(seq.imu[0, 1:4], [0.1, -0.2, 9.8])
    np.testing.assert_allclose(seq.imu[0, 4:7], [0.01, 0.02, -0.03])
    np.testing.assert_allclose(seq.wheel[0, 1:4], [0.5, 0.0, 0.0])
    # depth paired within ±3 ms and scaled mm → m
    t, img_p, dep_p = seq.frames[1]
    assert dep_p, "depth frame not paired"
    dep = load_image(dep_p)
    np.testing.assert_allclose(dep, 1.1, rtol=1e-6)
    img = load_image(img_p)
    assert img.shape == (8, 12)


def test_convert_bag_bz2_chunk(tmp_path):
    """bz2-compressed chunks decode identically."""
    import bz2

    bag = str(tmp_path / "mini.bag")
    _write_mini_bag(bag, n_frames=2)
    raw = open(bag, "rb").read()
    # rebuild with the chunk bz2-compressed
    sig_end = raw.index(b"\n") + 1
    recs = list(convert_bag._records(raw, sig_end))
    out = raw[:sig_end]
    for hdr, data in recs:
        if hdr["op"][0] == 0x05:
            cdata = bz2.compress(data)
            out += _rec({"op": b"\x05", "compression": b"bz2",
                         "size": hdr["size"]}, cdata)
        else:
            out += _rec(hdr, data)
    bag2 = str(tmp_path / "mini_bz2.bag")
    open(bag2, "wb").write(out)
    counts = convert_bag.convert(bag2, str(tmp_path / "seq2"))
    assert counts["frames"] == 2 and counts["imu"] == 20
