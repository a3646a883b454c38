"""Live run visualization — the headless analogue of the reference's rviz
setup (C12: rviz/floam.rviz + the /map republish at 10 Hz,
src/laserMappingNode.cpp:85-92, and the hector trajectory server,
launch/structor_odom.launch:49-59).

A TPU box has no display server, so instead of a ROS viz stack the runner
periodically publishes a small JSON snapshot (trajectory + downsampled map
sample + telemetry) plus full-resolution PCDs into a directory, and a
self-contained ``viewer.html`` (no external assets — works with zero
egress) renders the snapshot in any browser with live polling. Unlike the
reference's getMap() republish — O(whole map) serialized EVERY frame,
flagged in SURVEY.md section 3.3 — snapshots are rate-limited and the JSON
carries a bounded reservoir sample of the map.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional

import numpy as np

_VIEWER_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>floam_tpu live</title><style>
body{margin:0;background:#10141a;color:#cfd8e3;font:13px monospace}
#hud{position:fixed;top:8px;left:8px;white-space:pre;background:#10141acc;
padding:6px 8px;border:1px solid #2a3342;border-radius:4px}
canvas{display:block}
</style></head><body>
<div id="hud">loading…</div><canvas id="c"></canvas><script>
const cv=document.getElementById('c'),hud=document.getElementById('hud');
const ctx=cv.getContext('2d');let D=null;
function resize(){cv.width=innerWidth;cv.height=innerHeight;}
addEventListener('resize',()=>{resize();draw();});resize();
function draw(){if(!D)return;ctx.fillStyle='#10141a';
ctx.fillRect(0,0,cv.width,cv.height);
const pts=D.map_xy,hs=D.map_h,tr=D.traj;
let xs=[],ys=[];for(const p of tr){xs.push(p[0]);ys.push(p[1]);}
for(let i=0;i<pts.length;i+=2){xs.push(pts[i]);ys.push(pts[i+1]);}
if(!xs.length)return;
const x0=Math.min(...xs),x1=Math.max(...xs),y0=Math.min(...ys),
y1=Math.max(...ys);
const m=40,sc=Math.min((cv.width-2*m)/Math.max(x1-x0,1e-6),
(cv.height-2*m)/Math.max(y1-y0,1e-6));
const px=x=>m+(x-x0)*sc, py=y=>cv.height-m-(y-y0)*sc;
for(let i=0;i<pts.length;i+=2){const h=hs[i>>1];
const c=Math.max(0,Math.min(1,h));
ctx.fillStyle=`hsl(${200-160*c},80%,${35+30*c}%)`;
ctx.fillRect(px(pts[i]),py(pts[i+1]),2,2);}
ctx.strokeStyle='#ff5a5a';ctx.lineWidth=2;ctx.beginPath();
for(let i=0;i<tr.length;i++){const p=tr[i];
i?ctx.lineTo(px(p[0]),py(p[1])):ctx.moveTo(px(p[0]),py(p[1]));}
ctx.stroke();
if(tr.length){const p=tr[tr.length-1];ctx.fillStyle='#ffd24a';
ctx.beginPath();ctx.arc(px(p[0]),py(p[1]),5,0,7);ctx.fill();}
hud.textContent=`frame ${D.frame}  ${D.scans_per_sec.toFixed(1)} scans/s\\n`+
`map sample ${pts.length/2} pts  traj ${tr.length}  ${D.stamp}`;}
async function tick(){try{const r=await fetch('live.json?_='+Date.now());
if(r.ok){D=await r.json();draw();}}catch(e){}setTimeout(tick,1000);}
tick();</script></body></html>
"""


class LiveViz:
    """Rate-limited live snapshot publisher. Call :meth:`update` from the
    run loop; files land in ``out_dir``:

    * ``viewer.html`` — self-contained browser viewer (written once);
      serve the directory with ``python -m http.server`` and open it.
    * ``live.json`` — trajectory + bounded map sample + telemetry,
      atomically replaced (the viewer polls it).
    * ``map.pcd`` / ``trajectory.pcd`` — full-resolution snapshots for
      point-cloud tools, refreshed at the same cadence.
    """

    def __init__(self, out_dir, every: int = 20, map_sample: int = 20000,
                 write_pcds: bool = True):
        self.dir = Path(out_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.every = max(1, every)
        self.map_sample = map_sample
        self.write_pcds = write_pcds
        (self.dir / "viewer.html").write_text(_VIEWER_HTML)
        self._count = 0

    def update(self, trajectory_t: np.ndarray, map_points: np.ndarray,
               stamp: float = 0.0, scans_per_sec: float = 0.0,
               force: bool = False) -> bool:
        """``trajectory_t`` (N, 3); ``map_points`` (M, >=3) with optional
        intensity column 3. Returns True when a snapshot was written."""
        self._count += 1
        if not force and self._count % self.every:
            return False
        pts = np.asarray(map_points)
        if len(pts) > self.map_sample:
            # deterministic stride sample (bounded payload, stable frames)
            pts = pts[:: len(pts) // self.map_sample + 1]
        inten = pts[:, 3] if pts.shape[1] > 3 else \
            np.clip(pts[:, 2] / 5.0 + 0.4, 0, 1) if len(pts) else pts[:, :0]
        payload = {
            "frame": int(self._count),
            "stamp": float(stamp),
            "scans_per_sec": float(scans_per_sec),
            "traj": np.asarray(trajectory_t)[:, :2].round(3).tolist(),
            "map_xy": pts[:, :2].round(3).reshape(-1).tolist(),
            "map_h": np.asarray(inten).round(3).tolist(),
        }
        tmp = self.dir / "live.json.tmp"
        tmp.write_text(json.dumps(payload))
        tmp.replace(self.dir / "live.json")  # atomic publish
        if self.write_pcds and len(map_points):
            from .io.pcd import write_pcd

            mp = np.asarray(map_points)
            write_pcd(self.dir / "map.pcd", mp[:, :3],
                      mp[:, 3] if mp.shape[1] > 3 else None)
            if len(trajectory_t):
                write_pcd(self.dir / "trajectory.pcd",
                          np.asarray(trajectory_t))
        return True
