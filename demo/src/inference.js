/* ONNX Runtime Web session management: GPU capability probing, the
 * webgpu -> webgl -> wasm provider ladder, and the fp16 -> fp32 model
 * fallback. References: demo/src/model-inference.js:79-229 (capability
 * probe + ladder; WebGL matters because its kernel set lacks HardSigmoid
 * on some builds — see demo/README.md:46-48, the fp32 model avoids the
 * fp16 Cast ops that trip older providers) and
 * train-pose-estimation_custom/inference_test.py:102-129 (fp16 session
 * fallback ladder). */
export class ModelInference {
  constructor() {
    this.session = null;
    this.backend = null;
    this.modelUrl = null;
    this.stats = { frames: 0, totalMs: 0, lastMs: 0 };
    this.isInferring = false;
  }

  detectCapabilities() {
    const caps = { webgpu: false, webgl: false, wasm: true };
    caps.webgpu = typeof navigator !== 'undefined' && !!navigator.gpu;
    try {
      const c = document.createElement('canvas');
      caps.webgl = !!(c.getContext('webgl2') || c.getContext('webgl'));
    } catch (e) { /* no webgl */ }
    return caps;
  }

  // relative URLs so the demo works from any mount point (subpath deploys)
  async initialize(fp16Url = 'models/model_fp16.onnx',
                   fp32Url = 'models/model.onnx',
                   int8Url = 'models/model_int8.onnx') {
    const caps = this.detectCapabilities();
    const ladder = ['webgpu', 'webgl', 'wasm'].filter((p) => caps[p]);
    const errors = [];
    for (const ep of ladder) {
      // smallest usable download first: QDQ int8 (4x smaller, mask
      // agreement gated >= 99.9% at export) on wasm, where ort-web
      // executes DequantizeLinear reliably; fp16 on the GPU providers;
      // fp32 as the universal compat fallback
      const urls = ep === 'wasm'
        ? [int8Url, fp16Url, fp32Url] : [fp16Url, fp32Url];
      for (const url of urls) {
        try {
          this.session = await ort.InferenceSession.create(url, {
            executionProviders: [ep],
          });
          this.backend = ep;
          this.modelUrl = url;
          return { backend: ep, model: url };
        } catch (e) {
          errors.push(`${ep}/${url.split('/').pop()}: ${e.message || e}`);
        }
      }
    }
    throw new Error(`no usable provider/model combination:\n${errors.join('\n')}`);
  }

  async run(tensor) {
    if (this.isInferring) return null;  // re-entrancy guard (model-inference.js:307-310)
    this.isInferring = true;
    const t0 = performance.now();
    try {
      const out = await this.session.run({ input: tensor });
      const dt = performance.now() - t0;
      this.stats.frames += 1;
      this.stats.totalMs += dt;
      this.stats.lastMs = dt;
      return out.output;
    } finally {
      this.isInferring = false;
    }
  }

  statsLine() {
    const s = this.stats;
    if (!s.frames) return '';
    const avg = s.totalMs / s.frames;
    return `inference ${s.lastMs.toFixed(1)} ms | avg ${avg.toFixed(1)} ms | ` +
      `${(1000 / avg).toFixed(1)} fps | ${this.backend}` +
      `${this.modelUrl && this.modelUrl.includes('int8') ? ' int8'
        : this.modelUrl && this.modelUrl.includes('fp16') ? ' fp16' : ' fp32'}`;
  }
}
