/* Browser demo client for the TPU-exported card segmentation model.
 *
 * Same contract as the reference demo (demo/src/*.js): loads
 * /models/model_fp16.onnx (input "input" 1x3xHxW fp32, ImageNet
 * normalized; output "output" logits), runs a requestAnimationFrame
 * loop with provider fallback (webgpu -> wasm) and draws a cyan card
 * overlay. Compact rewrite — not the reference bundle.
 */
(() => {
  const H = 320, W = 240;               // model input (config contract)
  const MEAN = [0.485, 0.456, 0.406], STD = [0.229, 0.224, 0.225];
  const video = document.getElementById('video');
  const overlay = document.getElementById('overlay');
  const statsEl = document.getElementById('stats');
  const errEl = document.getElementById('error');
  const backendEl = document.getElementById('backend');
  const startBtn = document.getElementById('start');
  const stopBtn = document.getElementById('stop');
  const work = document.createElement('canvas');
  work.width = W; work.height = H;
  const wctx = work.getContext('2d', { willReadFrequently: true });
  let session = null, stream = null, running = false, busy = false;
  let frames = 0, totalMs = 0;

  async function loadModel() {
    const providers = ['webgpu', 'wasm'];
    for (const ep of providers) {
      try {
        session = await ort.InferenceSession.create('/models/model_fp16.onnx',
          { executionProviders: [ep] });
        backendEl.textContent = `backend: ${ep}`;
        return;
      } catch (e) { console.warn(`${ep} failed`, e); }
    }
    throw new Error('no ONNX execution provider available');
  }

  function preprocess() {
    // center-crop the video to 3:4 then resize into the work canvas
    const vw = video.videoWidth, vh = video.videoHeight;
    const target = 3 / 4;
    let cw = vw, ch = vh;
    if (vw / vh > target) cw = vh * target; else ch = vw / target;
    const sx = (vw - cw) / 2, sy = (vh - ch) / 2;
    wctx.drawImage(video, sx, sy, cw, ch, 0, 0, W, H);
    const { data } = wctx.getImageData(0, 0, W, H);
    const chw = new Float32Array(3 * H * W);
    for (let i = 0; i < H * W; i++) {
      for (let c = 0; c < 3; c++) {
        chw[c * H * W + i] = (data[i * 4 + c] / 255 - MEAN[c]) / STD[c];
      }
    }
    return new ort.Tensor('float32', chw, [1, 3, H, W]);
  }

  function drawMask(logits) {
    const ctx = overlay.getContext('2d');
    overlay.width = W; overlay.height = H;
    const img = ctx.createImageData(W, H);
    const n = H * W;
    for (let i = 0; i < n; i++) {
      const card = logits[n + i] > logits[i];   // argmax over 2 channels
      if (card) {
        img.data[i * 4] = 0; img.data[i * 4 + 1] = 255;
        img.data[i * 4 + 2] = 255; img.data[i * 4 + 3] = 110;
      }
    }
    ctx.putImageData(img, 0, 0);
  }

  async function loop() {
    if (!running) return;
    if (!busy && video.readyState >= 2) {
      busy = true;
      const t0 = performance.now();
      try {
        const out = await session.run({ input: preprocess() });
        drawMask(out.output.data);
        const dt = performance.now() - t0;
        frames++; totalMs += dt;
        statsEl.textContent =
          `inference ${dt.toFixed(1)} ms | avg ${(totalMs / frames).toFixed(1)} ms | ` +
          `${(1000 / (totalMs / frames)).toFixed(1)} fps`;
      } catch (e) { errEl.textContent = String(e); }
      busy = false;
    }
    requestAnimationFrame(loop);
  }

  startBtn.onclick = async () => {
    try {
      errEl.textContent = '';
      if (!session) await loadModel();
      stream = await navigator.mediaDevices.getUserMedia({
        video: { width: { ideal: 480 }, height: { ideal: 640 } }, audio: false,
      });
      video.srcObject = stream;
      running = true; startBtn.disabled = true; stopBtn.disabled = false;
      requestAnimationFrame(loop);
    } catch (e) { errEl.textContent = String(e); }
  };
  stopBtn.onclick = () => {
    running = false; startBtn.disabled = false; stopBtn.disabled = true;
    if (stream) stream.getTracks().forEach((t) => t.stop());
  };
})();
