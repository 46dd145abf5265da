/* App controller: init (camera enum -> model load -> UI), rAF inference
 * loop, start/stop + camera switch, error surface.
 * Reference: demo/src/app.js:42-79 (init), :284-316 (loop), :318-340 (stats). */
import { CameraManager } from './camera.js';
import { ModelInference } from './inference.js';
import { ImageUtils } from './image-utils.js';

const video = document.getElementById('video');
const overlay = document.getElementById('overlay');
const statsEl = document.getElementById('stats');
const errEl = document.getElementById('error');
const backendEl = document.getElementById('backend');
const startBtn = document.getElementById('start');
const stopBtn = document.getElementById('stop');
const camSel = document.getElementById('camera');

const camera = new CameraManager(video, camSel);
const inference = new ModelInference();
const imageUtils = new ImageUtils();
let running = false;

async function loop() {
  if (!running) return;
  if (video.readyState >= 2 && !inference.isInferring) {
    try {
      const out = await inference.run(imageUtils.preprocess(video));
      if (out) {
        imageUtils.drawMask(out.data, overlay);
        statsEl.textContent = inference.statsLine();
      }
    } catch (e) {
      errEl.textContent = String(e);  // per-frame error surface (app.js:307-310)
    }
  }
  requestAnimationFrame(loop);
}

startBtn.onclick = async () => {
  try {
    errEl.textContent = '';
    if (!inference.session) {
      backendEl.textContent = 'loading model…';
      const { backend, model } = await inference.initialize();
      backendEl.textContent = `backend: ${backend} (${model.split('/').pop()})`;
    }
    await camera.start(camSel && camSel.value ? camSel.value : undefined);
    running = true;
    startBtn.disabled = true;
    stopBtn.disabled = false;
    requestAnimationFrame(loop);
  } catch (e) {
    errEl.textContent = String(e);
    backendEl.textContent = '';
  }
};

stopBtn.onclick = () => {
  running = false;
  startBtn.disabled = false;
  stopBtn.disabled = true;
  camera.stop();
};

if (camSel) {
  camSel.onchange = async () => {
    if (running) {
      try { await camera.start(camSel.value); } catch (e) { errEl.textContent = String(e); }
    }
  };
}

camera.enumerate().catch(() => { /* pre-permission enumeration is best-effort */ });
