#!/usr/bin/env python
"""Convert a ROS1 bag (format 2.0) to the file-driven sequence layout of
``ground_fusion_tpu.io.dataset`` — the offline replacement for ``rosbag play``
(the reference's replay harness, ``/root/reference/README.md:146-186``),
with no ROS dependency: the bag container and the message wire format are
parsed directly.

    python scripts/convert_bag.py input.bag out_seq/ \
        [--imu-topic /camera/imu] [--wheel-topic /odom] \
        [--image-topic /camera/color/image_raw] \
        [--depth-topic /camera/aligned_depth_to_color/image_raw] \
        [--gps-topic /ublox_driver/receiver_lla] [--max-frames N]

Output layout (io/dataset.py):
    imu.csv     t, ax, ay, az, gx, gy, gz
    wheel.csv   t, vx, vy, vz, wx, wy, wz
    frames.csv  t, image_path[, depth_path]
    gps.csv     t, lat, lon, alt, acc          (NavSatFix, global fusion layer)
    img/*.npy   float32 grayscale / depth-in-meters arrays

Topics default to auto-detection by message type (first match wins; the
reference subscribes sensor_msgs/Imu, nav_msgs/Odometry,
sensor_msgs/Image ×2, rosNodeTest.cpp:678-711). Color/depth frames are
paired by nearest stamp within ±3 ms (sync_process, rosNodeTest.cpp:290-565).

Supported message types: sensor_msgs/Imu, nav_msgs/Odometry,
geometry_msgs/TwistStamped, sensor_msgs/Image (mono8 / mono16 / 16UC1 /
32FC1 / rgb8 / bgr8 / 8UC1), sensor_msgs/CompressedImage (png),
sensor_msgs/NavSatFix. Chunk compressions: none and bz2 (lz4 requires the
optional ``lz4`` package). Raw gnss_comm measurements are not converted —
tight GNSS needs ephemeris-evaluated satellite states; produce ``gnss.csv``
with ``scripts/make_synth_seq.py``'s writer or an SPP preprocessing pass.
"""

from __future__ import annotations

import argparse
import bz2
import os
import struct
import sys


# --------------------------------------------------------------- bag reading

def _parse_header(buf: bytes) -> dict:
    """A bag record header: sequence of (len u32, name=value) fields."""
    fields = {}
    pos = 0
    while pos < len(buf):
        (ln,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        entry = buf[pos : pos + ln]
        pos += ln
        eq = entry.index(b"=")
        fields[entry[:eq].decode()] = entry[eq + 1 :]
    return fields


def _records(buf: bytes, pos: int = 0):
    """Iterate (header dict, data bytes) records of a bag/chunk buffer."""
    n = len(buf)
    while pos + 8 <= n:
        (hlen,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        hdr = _parse_header(buf[pos : pos + hlen])
        pos += hlen
        (dlen,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        data = buf[pos : pos + dlen]
        pos += dlen
        yield hdr, data


def read_bag(path: str):
    """Yield (topic, msg_type, t_sec, raw_message_bytes) for every message.

    Handles the ROS bag 2.0 container: top-level bag-header / chunk /
    connection / index records; chunks hold connection + message-data
    records, compression none|bz2(|lz4 if installed)."""
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#ROSBAG V2.0"):
            raise ValueError(f"not a ROS bag 2.0 file: {magic!r}")
        buf = f.read()

    connections: dict[int, tuple[str, str]] = {}

    def handle_message_records(data: bytes):
        for hdr, payload in _records(data):
            op = hdr.get("op", b"\x00")[0]
            if op == 0x07:  # connection
                conn = struct.unpack("<I", hdr["conn"])[0]
                topic = hdr["topic"].decode()
                sub = _parse_header(payload)
                mtype = sub.get("type", b"").decode()
                connections[conn] = (topic, mtype)
            elif op == 0x02:  # message data
                conn = struct.unpack("<I", hdr["conn"])[0]
                secs, nsecs = struct.unpack("<II", hdr["time"])
                topic, mtype = connections.get(conn, ("?", "?"))
                yield topic, mtype, secs + 1e-9 * nsecs, payload

    for hdr, data in _records(buf):
        op = hdr.get("op", b"\x00")[0]
        if op == 0x05:  # chunk
            comp = hdr.get("compression", b"none").decode()
            if comp == "bz2":
                data = bz2.decompress(data)
            elif comp == "lz4":
                try:
                    import lz4.frame  # optional, not in the base image
                except ImportError as e:
                    raise RuntimeError("bag uses lz4 chunks; install lz4") from e
                data = lz4.frame.decompress(data)
            elif comp != "none":
                raise ValueError(f"unknown chunk compression {comp!r}")
            yield from handle_message_records(data)
        elif op == 0x07:  # stray top-level connection (post-chunk copies)
            conn = struct.unpack("<I", hdr["conn"])[0]
            topic = hdr["topic"].decode()
            sub = _parse_header(data)
            connections.setdefault(conn, (topic, sub.get("type", b"").decode()))
        # 0x03 bag header, 0x04 index, 0x06 chunk info: skipped


# ------------------------------------------------------- msg deserialization

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u8(self):
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u32(self):
        (v,) = struct.unpack_from("<I", self.buf, self.pos)
        self.pos += 4
        return v

    def f64(self, n=1):
        v = struct.unpack_from(f"<{n}d", self.buf, self.pos)
        self.pos += 8 * n
        return v if n > 1 else v[0]

    def string(self):
        n = self.u32()
        s = self.buf[self.pos : self.pos + n]
        self.pos += n
        return s.decode(errors="replace")

    def bytes_(self):
        n = self.u32()
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def header(self):
        """std_msgs/Header: seq, stamp, frame_id. Returns stamp seconds."""
        self.u32()
        secs, nsecs = self.u32(), self.u32()
        self.string()
        return secs + 1e-9 * nsecs


def parse_imu(raw: bytes):
    r = _Reader(raw)
    t = r.header()
    r.f64(4)            # orientation
    r.f64(9)            # orientation covariance
    gyr = r.f64(3)
    r.f64(9)
    acc = r.f64(3)
    return t, acc, gyr


def parse_odometry(raw: bytes):
    """nav_msgs/Odometry → (t, twist.linear, twist.angular) — the wheel
    callback's consumption (rosNodeTest.cpp:81-188)."""
    r = _Reader(raw)
    t = r.header()
    r.string()          # child_frame_id
    r.f64(7)            # pose position+orientation
    r.f64(36)           # pose covariance
    lin = r.f64(3)
    ang = r.f64(3)
    return t, lin, ang


def parse_twist_stamped(raw: bytes):
    r = _Reader(raw)
    t = r.header()
    lin = r.f64(3)
    ang = r.f64(3)
    return t, lin, ang


def parse_navsatfix(raw: bytes):
    r = _Reader(raw)
    t = r.header()
    r.u8()              # status.status (int8)
    r.pos += 1          # hmm: status is int8 + service uint16
    r.pos += 1
    lat, lon, alt = r.f64(3)
    cov = r.f64(9)
    r.u8()              # covariance type
    acc = max(cov[0], 0.0) ** 0.5 if cov[0] > 0 else 1.0
    return t, lat, lon, alt, acc


def parse_image(raw: bytes):
    import numpy as np

    r = _Reader(raw)
    t = r.header()
    h, w = r.u32(), r.u32()
    enc = r.string()
    r.u8()              # is_bigendian
    step = r.u32()
    data = r.bytes_()
    if enc in ("mono8", "8UC1"):
        img = np.frombuffer(data, np.uint8).reshape(h, step)[:, :w].astype(np.float32)
    elif enc in ("mono16", "16UC1"):
        img = np.frombuffer(data, np.uint16).reshape(h, step // 2)[:, :w].astype(np.float32)
    elif enc == "32FC1":
        img = np.frombuffer(data, np.float32).reshape(h, step // 4)[:, :w].copy()
    elif enc in ("rgb8", "bgr8"):
        img = np.frombuffer(data, np.uint8).reshape(h, step)[:, : 3 * w]
        img = img.reshape(h, w, 3).astype(np.float32).mean(-1)
    else:
        raise ValueError(f"unsupported image encoding {enc!r}")
    return t, enc, img


def parse_compressed_image(raw: bytes):
    from ground_fusion_tpu.io.dataset import _read_png_gray
    import tempfile

    r = _Reader(raw)
    t = r.header()
    fmt = r.string()
    data = r.bytes_()
    if "png" not in fmt and not data.startswith(b"\x89PNG"):
        raise ValueError(f"unsupported compressed format {fmt!r} (png only)")
    with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as fp:
        fp.write(data)
        tmp = fp.name
    try:
        img = _read_png_gray(tmp)
    finally:
        os.unlink(tmp)
    return t, fmt, img


# ------------------------------------------------------------------- convert

IMU_TYPES = {"sensor_msgs/Imu"}
WHEEL_TYPES = {"nav_msgs/Odometry"}
TWIST_TYPES = {"geometry_msgs/TwistStamped"}
IMAGE_TYPES = {"sensor_msgs/Image"}
CIMAGE_TYPES = {"sensor_msgs/CompressedImage"}
GPS_TYPES = {"sensor_msgs/NavSatFix"}


def convert(bag_path: str, out_dir: str, imu_topic=None, wheel_topic=None,
            image_topic=None, depth_topic=None, gps_topic=None,
            depth_scale=1000.0, max_frames=None, sync_ms=3.0,
            right_topic=None) -> dict:
    """Run the conversion; returns counters for reporting/tests."""
    import numpy as np

    os.makedirs(os.path.join(out_dir, "img"), exist_ok=True)
    imu_rows, wheel_rows, gps_rows = [], [], []
    color, depth, right = [], [], []          # (t, path)
    n_img = 0

    for topic, mtype, t_bag, raw in read_bag(bag_path):
        if mtype in IMU_TYPES and imu_topic in (None, topic):
            t, acc, gyr = parse_imu(raw)
            imu_rows.append((t or t_bag, *acc, *gyr))
        elif mtype in WHEEL_TYPES and wheel_topic in (None, topic):
            t, lin, ang = parse_odometry(raw)
            wheel_rows.append((t or t_bag, *lin, *ang))
        elif mtype in TWIST_TYPES and wheel_topic in (None, topic):
            t, lin, ang = parse_twist_stamped(raw)
            wheel_rows.append((t or t_bag, *lin, *ang))
        elif mtype in GPS_TYPES and gps_topic in (None, topic):
            gps_rows.append(parse_navsatfix(raw))
        elif mtype in IMAGE_TYPES or mtype in CIMAGE_TYPES:
            is_depth = depth_topic is not None and topic == depth_topic
            if not is_depth and depth_topic is None and "depth" in topic:
                is_depth = True
            is_right = (not is_depth and right_topic is not None
                        and topic == right_topic)
            if not is_depth and not is_right and image_topic not in (None, topic):
                continue
            if max_frames is not None and not (is_depth or is_right) \
                    and len(color) >= max_frames:
                continue
            if mtype in IMAGE_TYPES:
                t, enc, img = parse_image(raw)
            else:
                t, enc, img = parse_compressed_image(raw)
            t = t or t_bag
            if is_depth:
                if enc in ("mono16", "16UC1"):
                    img = img / depth_scale       # mm → m (D435i convention)
                name = f"img/d{n_img:06d}.npy"
            elif is_right:
                name = f"img/r{n_img:06d}.npy"
            else:
                name = f"img/c{n_img:06d}.npy"
            n_img += 1
            np.save(os.path.join(out_dir, name), img.astype(np.float32))
            (depth if is_depth else right if is_right else color).append((t, name))

    # pair color/depth/right by nearest stamp within ±sync_ms (rosNodeTest sync)
    frames = []
    dts = np.array([t for t, _ in depth]) if depth else None
    rts = np.array([t for t, _ in right]) if right else None
    for t, cpath in sorted(color):
        dpath = rpath = ""
        if dts is not None and len(dts):
            j = int(np.argmin(np.abs(dts - t)))
            if abs(dts[j] - t) < sync_ms * 1e-3:
                dpath = depth[j][1]
        if rts is not None and len(rts):
            j = int(np.argmin(np.abs(rts - t)))
            if abs(rts[j] - t) < sync_ms * 1e-3:
                rpath = right[j][1]
        frames.append((t, cpath, dpath, rpath))

    def dump(name, rows, fmt):
        if not rows:
            return
        with open(os.path.join(out_dir, name), "w") as fp:
            for row in sorted(rows):
                fp.write(fmt(row) + "\n")

    dump("imu.csv", imu_rows, lambda r: ",".join(f"{v:.9f}" for v in r))
    dump("wheel.csv", wheel_rows, lambda r: ",".join(f"{v:.9f}" for v in r))
    dump("gps.csv", gps_rows, lambda r: ",".join(f"{v:.9f}" for v in r))
    dump("frames.csv", frames,
         lambda r: f"{r[0]:.9f},{r[1]},{r[2]}" + (f",{r[3]}" if r[3] else ""))
    return dict(imu=len(imu_rows), wheel=len(wheel_rows), gps=len(gps_rows),
                frames=len(frames), depth=len(depth), right=len(right))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("bag")
    ap.add_argument("out_dir")
    ap.add_argument("--imu-topic")
    ap.add_argument("--wheel-topic")
    ap.add_argument("--image-topic")
    ap.add_argument("--depth-topic")
    ap.add_argument("--gps-topic")
    ap.add_argument("--right-topic", help="rectified right stereo image topic")
    ap.add_argument("--depth-scale", type=float, default=1000.0,
                    help="divisor mapping 16UC1 depth to meters (D435i: mm)")
    ap.add_argument("--max-frames", type=int)
    args = ap.parse_args(argv)
    counts = convert(args.bag, args.out_dir, args.imu_topic, args.wheel_topic,
                     args.image_topic, args.depth_topic, args.gps_topic,
                     args.depth_scale, args.max_frames,
                     right_topic=args.right_topic)
    print(f"converted: {counts}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
