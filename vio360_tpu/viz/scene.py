"""3D scene export: PLY point clouds, trajectory plots, HTML viewer.

Headless counterpart of ``VizUtils::Draw3DScene`` (VizUtils.cpp:167-466
— trajectory line, keyframe frusta, MapPoint cloud). Outputs:

- ``write_ply``       — landmarks + trajectory as a standard PLY any
                        viewer (MeshLab/CloudCompare/rerun) can open;
- ``write_html_viewer`` — a single self-contained HTML file with an
                        orbitable canvas 3D view (no network, no deps);
- ``plot_trajectory`` — matplotlib top-down + altitude profile PNG.
"""

from __future__ import annotations

import json

import numpy as np


def write_ply(
    path: str,
    points: np.ndarray,  # [M,3] landmark positions
    point_mask: np.ndarray | None = None,  # [M] bool alive
    trajectory: np.ndarray | None = None,  # [T,3] positions
) -> int:
    """Write landmarks (white) + trajectory (green) as PLY vertices.
    Returns the number of vertices written."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    if point_mask is not None:
        pts = pts[np.asarray(point_mask, bool)]
    finite = np.isfinite(pts).all(axis=1)
    pts = pts[finite]
    rows = [(p, (200, 200, 200)) for p in pts]
    if trajectory is not None:
        for p in np.asarray(trajectory, np.float32).reshape(-1, 3):
            rows.append((p, (0, 255, 0)))
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(rows)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p, c in rows:
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {c[0]} {c[1]} {c[2]}\n")
    return len(rows)


def plot_trajectory(
    path: str,
    trajectory: np.ndarray,  # [T,3]
    groundtruth: np.ndarray | None = None,  # [T,3] optional reference
    keyframes: np.ndarray | None = None,  # [K,3]
) -> None:
    """Top-down (x-y) + altitude (z over index) PNG via matplotlib."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    traj = np.asarray(trajectory).reshape(-1, 3)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 5))
    ax1.plot(traj[:, 0], traj[:, 1], "-", color="#2a6fdb", lw=1.2, label="estimate")
    if groundtruth is not None:
        gt = np.asarray(groundtruth).reshape(-1, 3)
        ax1.plot(gt[:, 0], gt[:, 1], "--", color="#999999", lw=1.0, label="groundtruth")
        ax2.plot(gt[:, 2], "--", color="#999999", lw=1.0)
    if keyframes is not None and len(keyframes):
        kf = np.asarray(keyframes).reshape(-1, 3)
        ax1.scatter(kf[:, 0], kf[:, 1], s=14, color="#d62728", zorder=3, label="keyframes")
    ax1.set_xlabel("x [m]")
    ax1.set_ylabel("y [m]")
    ax1.set_title("top-down trajectory")
    ax1.axis("equal")
    ax1.legend(loc="best", fontsize=8)
    ax2.plot(traj[:, 2], color="#2a6fdb", lw=1.2)
    ax2.set_xlabel("frame")
    ax2.set_ylabel("z [m]")
    ax2.set_title("altitude")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>vio360 map</title><style>
body{margin:0;background:#111;color:#ddd;font:12px monospace;overflow:hidden}
#hud{position:fixed;top:8px;left:8px;pointer-events:none}
canvas{display:block}
</style></head><body>
<div id="hud">drag: orbit &nbsp; wheel: zoom &nbsp; shift-drag: pan</div>
<canvas id="c"></canvas>
<script>
const DATA = __DATA__;
const cv = document.getElementById('c'), ctx = cv.getContext('2d');
let yaw=-0.7, pitch=0.5, dist=0, cx=[0,0,0], panx=0, pany=0;
(function init(){
  const all = DATA.points.concat(DATA.traj);
  if(all.length){
    const mins=[1/0,1/0,1/0], maxs=[-1/0,-1/0,-1/0];
    for(const p of all) for(let i=0;i<3;i++){mins[i]=Math.min(mins[i],p[i]);maxs[i]=Math.max(maxs[i],p[i]);}
    for(let i=0;i<3;i++) cx[i]=(mins[i]+maxs[i])/2;
    dist = 2.0*Math.max(maxs[0]-mins[0],maxs[1]-mins[1],maxs[2]-mins[2],1e-3);
  } else dist=10;
})();
function project(p){
  const x=p[0]-cx[0], y=p[1]-cx[1], z=p[2]-cx[2];
  const cy=Math.cos(yaw), sy=Math.sin(yaw), cp=Math.cos(pitch), sp=Math.sin(pitch);
  const x1=cy*x+sy*y, y1=-sy*x+cy*y;
  const y2=cp*y1-sp*z, z2=sp*y1+cp*z;
  const zc=dist+y2;
  if(zc<1e-3) return null;
  const f=0.9*Math.min(cv.width,cv.height);
  return [cv.width/2+f*x1/zc+panx, cv.height/2-f*z2/zc+pany, zc];
}
function draw(){
  cv.width=innerWidth; cv.height=innerHeight;
  ctx.fillStyle='#111'; ctx.fillRect(0,0,cv.width,cv.height);
  ctx.fillStyle='#cccccc';
  for(const p of DATA.points){const s=project(p); if(s) ctx.fillRect(s[0],s[1],1.6,1.6);}
  ctx.strokeStyle='#36c275'; ctx.lineWidth=1.5; ctx.beginPath(); let started=false;
  for(const p of DATA.traj){const s=project(p); if(!s){started=false;continue;}
    if(started) ctx.lineTo(s[0],s[1]); else {ctx.moveTo(s[0],s[1]); started=true;}}
  ctx.stroke();
  ctx.fillStyle='#d64545';
  for(const p of DATA.keyframes){const s=project(p); if(s) ctx.fillRect(s[0]-2,s[1]-2,4,4);}
}
let drag=false,px=0,py=0,shift=false;
cv.onmousedown=e=>{drag=true;px=e.clientX;py=e.clientY;shift=e.shiftKey};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;
  if(shift){panx+=e.clientX-px; pany+=e.clientY-py;}
  else {yaw+=(e.clientX-px)*0.008; pitch+=(e.clientY-py)*0.008;
        pitch=Math.max(-1.55,Math.min(1.55,pitch));}
  px=e.clientX;py=e.clientY;draw();};
cv.onwheel=e=>{dist*=Math.exp(e.deltaY*0.001);draw();e.preventDefault();};
window.onresize=draw; draw();
</script></body></html>
"""


def write_html_viewer(
    path: str,
    trajectory: np.ndarray,  # [T,3]
    points: np.ndarray | None = None,  # [M,3]
    point_mask: np.ndarray | None = None,
    keyframes: np.ndarray | None = None,  # [K,3]
    max_points: int = 20000,
) -> None:
    """Self-contained interactive 3D viewer (no external assets)."""

    def clean(arr):
        if arr is None:
            return []
        a = np.asarray(arr, np.float64).reshape(-1, 3)
        a = a[np.isfinite(a).all(axis=1)]
        return np.round(a, 4).tolist()

    pts = np.asarray(points, np.float64).reshape(-1, 3) if points is not None else np.zeros((0, 3))
    if point_mask is not None and len(pts):
        pts = pts[np.asarray(point_mask, bool)]
    if len(pts) > max_points:
        pts = pts[np.linspace(0, len(pts) - 1, max_points).astype(int)]
    data = {"traj": clean(trajectory), "points": clean(pts), "keyframes": clean(keyframes)}
    with open(path, "w") as f:
        f.write(_HTML_TEMPLATE.replace("__DATA__", json.dumps(data)))
