/* Camera manager: permission, device enumeration/selection, constraint
 * fallback ladder. Reference: demo/src/camera-manager.js:11-60 (480x640
 * preferred, 640x480 fallback, device dropdown). */
export class CameraManager {
  constructor(videoEl, selectEl) {
    this.video = videoEl;
    this.select = selectEl;
    this.stream = null;
    this.devices = [];
  }

  async enumerate() {
    // labels only appear after permission; request a throwaway stream first
    if (!this.devices.length) {
      try {
        const tmp = await navigator.mediaDevices.getUserMedia({ video: true });
        tmp.getTracks().forEach((t) => t.stop());
      } catch (e) { /* enumeration still works, just unlabeled */ }
    }
    const all = await navigator.mediaDevices.enumerateDevices();
    this.devices = all.filter((d) => d.kind === 'videoinput');
    if (this.select) {
      this.select.innerHTML = '';
      this.devices.forEach((d, i) => {
        const opt = document.createElement('option');
        opt.value = d.deviceId;
        opt.textContent = d.label || `Camera ${i + 1}`;
        this.select.appendChild(opt);
      });
      this.select.disabled = this.devices.length < 2;
    }
    return this.devices;
  }

  async start(deviceId) {
    this.stop();
    // constraint ladder: portrait 480x640 -> landscape 640x480 -> anything
    const base = deviceId ? { deviceId: { exact: deviceId } } : {};
    const ladder = [
      { ...base, width: { ideal: 480 }, height: { ideal: 640 } },
      { ...base, width: { ideal: 640 }, height: { ideal: 480 } },
      { ...base },
    ];
    let lastErr = null;
    for (const video of ladder) {
      try {
        this.stream = await navigator.mediaDevices.getUserMedia({ video, audio: false });
        this.video.srcObject = this.stream;
        await this.enumerate();  // refresh labels post-permission
        return this.stream;
      } catch (e) { lastErr = e; }
    }
    throw lastErr || new Error('no camera available');
  }

  stop() {
    if (this.stream) {
      this.stream.getTracks().forEach((t) => t.stop());
      this.stream = null;
    }
  }
}
