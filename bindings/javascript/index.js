// whisper-tpu — Node.js binding for libwhisper_tpu.so.
//
// The heavy lifting is the N-API addon (addon.cc); this wrapper adds a
// small idiomatic class API mirroring the shape of the other bindings
// (go/ruby/java/perl).  Build the addon first: `npx node-gyp rebuild`.

"use strict";

const path = require("path");

function loadAddon() {
  const candidates = [
    path.join(__dirname, "build", "Release", "whisper_tpu.node"),
    path.join(__dirname, "build", "Debug", "whisper_tpu.node"),
  ];
  for (const p of candidates) {
    try {
      return require(p);
    } catch (e) {
      if (e.code !== "MODULE_NOT_FOUND") throw e;
    }
  }
  throw new Error(
    "whisper-tpu native addon not built; run `npx node-gyp rebuild` in " +
      __dirname
  );
}

const native = loadAddon();

const SAMPLE_RATE = 16000;

/** A loaded model plus its decode state. */
class Context {
  /** @param {string} modelPath path to a ggml model file */
  constructor(modelPath) {
    this._h = native.init(modelPath);
    this._opts = {};
  }

  /** Default options applied to every full() call. */
  set options(opts) {
    this._opts = { ...opts };
  }
  get options() {
    return { ...this._opts };
  }

  /**
   * Transcribe mono 16 kHz PCM.
   * @param {Float32Array} samples PCM in [-1, 1]
   * @param {object} [opts] per-call overrides (language, translate,
   *   beamSize, bestOf, temperature, nProcessors, ...)
   * @returns {Array<{t0:number,t1:number,text:string,speakerTurnNext:boolean}>}
   */
  transcribe(samples, opts = {}) {
    native.full(this._h, samples, { ...this._opts, ...opts });
    return native.segments(this._h);
  }

  /** Segments of the last transcribe() call. */
  segments() {
    return native.segments(this._h);
  }

  /** Language id picked by auto-detect on the last run. */
  detectedLangId() {
    return native.detectedLangId(this._h);
  }

  /** Release the model and device buffers. */
  close() {
    if (this._h) {
      native.free(this._h);
      this._h = null;
    }
  }
}

module.exports = {
  Context,
  SAMPLE_RATE,
  languages: () => native.languages(),
  systemInfo: () => native.systemInfo(),
  version: () => native.version(),
};
