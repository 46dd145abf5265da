/* Frame pre/post-processing: 3:4 center-crop, ImageNet CHW normalize,
 * 2-class argmax mask, cyan overlay. Reference: demo/src/image-utils.js
 * (crop :255-293, normalize :85-109, argmax :167-180, overlay :190-227). */
export const MODEL_H = 320;
export const MODEL_W = 240;
const MEAN = [0.485, 0.456, 0.406];
const STD = [0.229, 0.224, 0.225];

export class ImageUtils {
  constructor() {
    this.work = document.createElement('canvas');
    this.work.width = MODEL_W;
    this.work.height = MODEL_H;
    this.ctx = this.work.getContext('2d', { willReadFrequently: true });
  }

  /* video frame -> (1,3,H,W) fp32 ImageNet-normalized ort.Tensor */
  preprocess(video) {
    const vw = video.videoWidth, vh = video.videoHeight;
    const target = 3 / 4;  // W:H of the model input
    let cw = vw, ch = vh;
    if (vw / vh > target) cw = vh * target; else ch = vw / target;
    const sx = (vw - cw) / 2, sy = (vh - ch) / 2;
    this.ctx.drawImage(video, sx, sy, cw, ch, 0, 0, MODEL_W, MODEL_H);
    const { data } = this.ctx.getImageData(0, 0, MODEL_W, MODEL_H);
    const n = MODEL_H * MODEL_W;
    const chw = new Float32Array(3 * n);
    for (let i = 0; i < n; i++) {
      for (let c = 0; c < 3; c++) {
        chw[c * n + i] = (data[i * 4 + c] / 255 - MEAN[c]) / STD[c];
      }
    }
    return new ort.Tensor('float32', chw, [1, 3, MODEL_H, MODEL_W]);
  }

  /* logits (1,2,H,W) -> cyan overlay on the canvas */
  drawMask(logits, overlay) {
    overlay.width = MODEL_W;
    overlay.height = MODEL_H;
    const octx = overlay.getContext('2d');
    const img = octx.createImageData(MODEL_W, MODEL_H);
    const n = MODEL_H * MODEL_W;
    for (let i = 0; i < n; i++) {
      if (logits[n + i] > logits[i]) {  // argmax: card > background
        img.data[i * 4] = 0;
        img.data[i * 4 + 1] = 255;
        img.data[i * 4 + 2] = 255;
        img.data[i * 4 + 3] = 110;
      }
    }
    octx.putImageData(img, 0, 0);
  }
}
