package graft.ml

/** Log-mel spectrogram frontend for speech models — the Whisper input
  * features (Radford et al. 2022, public `whisper/audio.py`): Hann-windowed
  * STFT (center=true, reflect padding, last frame dropped), Slaney-scale
  * mel filterbank, `log10` clamped to max−8 then `(x+4)/4`.
  *
  * The DFT is a naive O(n²) real transform with precomputed twiddle
  * tables — n_fft is 400 for Whisper (not a power of two), audio clips are
  * short, and executor-side throughput is bounded by the decoder loop, not
  * the FFT; swap in a Bluestein/BLAS FFT for production-scale audio.
  */
object Mel {

  final case class MelConfig(
      sampleRate: Int = 16000,
      nFft: Int = 400,
      hop: Int = 160,
      nMels: Int = 80,
  )

  def hann(n: Int): Array[Double] =
    Array.tabulate(n)(i => 0.5 * (1.0 - math.cos(2.0 * math.Pi * i / n)))

  /** Power spectrum |DFT|² of one windowed frame → nFft/2+1 bins. */
  private final class Dft(n: Int) {
    private val cos = Array.tabulate(n / 2 + 1, n)((k, t) => math.cos(-2.0 * math.Pi * k * t / n))
    private val sin = Array.tabulate(n / 2 + 1, n)((k, t) => math.sin(-2.0 * math.Pi * k * t / n))
    def power(frame: Array[Double]): Array[Double] = {
      val out = new Array[Double](n / 2 + 1)
      var k = 0
      while (k < out.length) {
        var re = 0.0; var im = 0.0
        var t = 0
        while (t < n) { re += frame(t) * cos(k)(t); im += frame(t) * sin(k)(t); t += 1 }
        out(k) = re * re + im * im
        k += 1
      }
      out
    }
  }

  private def hzToMel(hz: Double): Double = {
    // Slaney scale: linear below 1 kHz, log above (librosa htk=False)
    val fMin = 0.0; val fSp = 200.0 / 3
    val minLogHz = 1000.0; val minLogMel = (minLogHz - fMin) / fSp
    val logstep = math.log(6.4) / 27.0
    if (hz >= minLogHz) minLogMel + math.log(hz / minLogHz) / logstep
    else (hz - fMin) / fSp
  }

  private def melToHz(mel: Double): Double = {
    val fMin = 0.0; val fSp = 200.0 / 3
    val minLogHz = 1000.0; val minLogMel = (minLogHz - fMin) / fSp
    val logstep = math.log(6.4) / 27.0
    if (mel >= minLogMel) minLogHz * math.exp(logstep * (mel - minLogMel))
    else fMin + fSp * mel
  }

  /** Slaney-normalized triangular filterbank [nMels, nFft/2+1]. */
  def filterbank(cfg: MelConfig): Array[Array[Double]] = {
    val nBins = cfg.nFft / 2 + 1
    val fftFreqs = Array.tabulate(nBins)(i => i.toDouble * cfg.sampleRate / cfg.nFft)
    val melMax = hzToMel(cfg.sampleRate / 2.0)
    val melPts = Array.tabulate(cfg.nMels + 2)(i => melToHz(melMax * i / (cfg.nMels + 1)))
    Array.tabulate(cfg.nMels) { m =>
      val lower = melPts(m); val center = melPts(m + 1); val upper = melPts(m + 2)
      val norm = 2.0 / (upper - lower) // Slaney area normalization
      fftFreqs.map { f =>
        val up = (f - lower) / (center - lower)
        val down = (upper - f) / (upper - center)
        math.max(0.0, math.min(up, down)) * norm
      }
    }
  }

  /** samples (already at cfg.sampleRate, [-1,1]) → [nFrames][nMels]. */
  def logMelSpectrogram(samples: Array[Float], cfg: MelConfig = MelConfig()): Array[Array[Float]] = {
    val n = cfg.nFft
    val half = n / 2
    // center=true reflect padding
    val padded = new Array[Double](samples.length + n)
    var i = 0
    while (i < padded.length) {
      val src = i - half
      val idx =
        if (src < 0) math.min(samples.length - 1, -src)
        else if (src >= samples.length) math.max(0, 2 * samples.length - 2 - src)
        else src
      padded(i) = if (samples.isEmpty) 0.0 else samples(idx)
      i += 1
    }
    val win = hann(n)
    val dft = new Dft(n)
    val nFramesAll = 1 + samples.length / cfg.hop
    val nFrames = math.max(1, nFramesAll - 1) // whisper drops the last frame
    val fb = filterbank(cfg)
    val mels = Array.ofDim[Double](nFrames, cfg.nMels)
    var fr = 0
    while (fr < nFrames) {
      val frame = new Array[Double](n)
      var t = 0
      while (t < n) { frame(t) = padded(fr * cfg.hop + t) * win(t); t += 1 }
      val pow = dft.power(frame)
      var m = 0
      while (m < cfg.nMels) {
        var acc = 0.0
        val row = fb(m)
        var k = 0
        while (k < pow.length) { acc += row(k) * pow(k); k += 1 }
        mels(fr)(m) = math.log10(math.max(acc, 1e-10))
        m += 1
      }
      fr += 1
    }
    // clamp to global max − 8, scale (x+4)/4
    var mx = Double.MinValue
    mels.foreach(_.foreach(v => if (v > mx) mx = v))
    mels.map(_.map(v => ((math.max(v, mx - 8.0) + 4.0) / 4.0).toFloat))
  }

  /** Linear resample to targetRate (good enough for speech features). */
  def resample(samples: Array[Float], fromRate: Int, targetRate: Int): Array[Float] = {
    if (fromRate == targetRate || samples.isEmpty) return samples
    val outLen = math.max(1, (samples.length.toLong * targetRate / fromRate).toInt)
    Array.tabulate(outLen) { i =>
      val pos = i.toDouble * fromRate / targetRate
      val i0 = math.min(samples.length - 1, pos.toInt)
      val i1 = math.min(samples.length - 1, i0 + 1)
      val frac = pos - i0
      (samples(i0) * (1 - frac) + samples(i1) * frac).toFloat
    }
  }
}
