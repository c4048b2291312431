package graft.jobhistory

import java.awt.Color
import java.nio.file.Files

import javax.imageio.ImageIO

import graft.SparkSpec

/** S6 PNG chart sink: reference-CGI parity (1200x800, five stacked
  * series in the CGI's exact paints — job_history.cgi:344-390). */
class ChartSpec extends SparkSpec {

  private val blue = new Color(0x22, 0x22, 0xFF).getRGB
  private val green = new Color(0x22, 0xFF, 0x22).getRGB
  private val red = new Color(0xFF, 0x22, 0x22).getRGB
  private val yellow = new Color(0xFF, 0xFF, 0x22).getRGB
  private val black = new Color(0, 0, 0).getRGB
  private val bg = new Color(249, 231, 236).getRGB

  test("stacked series render bottom-up in the reference's colors") {
    // one time unit, stack = maps 2 / shuffle 1 / merge 1 / reduce 1 /
    // waste 1 (maxTotal 6, plotH 700 => bands of 233/116 px)
    val img = ChartSink.render(
      Seq(Array(2L), Array(1L), Array(1L), Array(1L), Array(1L)),
      "t", 1200, 800)
    assert(img.getWidth === 1200 && img.getHeight === 800)
    assert(img.getRGB(5, 5) === bg)
    val x = 60 + 10 // inside the plot
    assert(img.getRGB(x, 600) === blue, "maps band")
    assert(img.getRGB(x, 450) === green, "shuffle band")
    assert(img.getRGB(x, 330) === red, "merge band")
    assert(img.getRGB(x, 200) === yellow, "reduce band")
    assert(img.getRGB(x, 100) === black, "waste band")
    assert(img.getRGB(x, 41) === Color.WHITE.getRGB, "above the stack")
  }

  test("empty timeline still renders a valid chart") {
    val img = ChartSink.render(Seq.fill(5)(Array.empty[Long]), "", 1200, 800)
    assert(img.getWidth === 1200 && img.getHeight === 800)
  }

  /** MD5 of the raw ARGB rows of the PLOT INTERIOR only (x in [left,
    * left+plotW), y in [top, top+plotH)) — not the PNG byte stream
    * (encoders legally differ) and not the margins: every text label
    * renders via platform glyph rasterization, which varies across
    * JREs/fontconfig, so a whole-image hash fails spuriously on a
    * different box. Both renderers keep the interior font-free by
    * contract (all drawString calls land in the margins); the interior
    * marks are AA-off fills/lines — deterministic everywhere. */
  private def interiorHash(img: java.awt.image.BufferedImage): String = {
    val (left, right, top, bottom) = (60, 20, 40, 60)
    val plotW = img.getWidth - left - right
    val plotH = img.getHeight - top - bottom
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(4 * plotW)
    for (y <- top until top + plotH) {
      buf.clear()
      for (x <- left until left + plotW) buf.putInt(img.getRGB(x, y))
      md.update(buf.array())
    }
    md.digest().map("%02x".format(_)).mkString
  }

  test("golden chart: Pig-fixture plot-interior pixels at scale 1000 are pinned") {
    // any drift in series classification, stacking order, paints, or
    // geometry changes the hash; re-pin deliberately if the rendering
    // is ever *meant* to change
    val out = Files.createTempFile("graft-chart-golden", ".png")
    try {
      Cli.run(spark, Cli.Config(input = Fixtures.pig, png = Some(out.toString)))
      val hash = interiorHash(ImageIO.read(out.toFile))
      assert(hash === "f2ede368ee9546783ebd100deb34636f",
        s"rendered interior pixel hash drifted: $hash")
    } finally Files.deleteIfExists(out)
  }

  test("gantt marks: map bar, reduce shuffle+sort segments, blue frame lines") {
    // one map [110, 200], one reduce start 105 / maps-complete 200 /
    // shuffle-finish 300 / end 400 on a 340px-wide plot over span 295
    // (the reduce starts first, so the map's start tick is off the
    // dark-gray plot border; its bullet sits at maps-complete anyway)
    val img = ChartSink.renderGantt(
      Seq((110L, 200L)), Seq((105L, 200L, 300L, 400L)), "", 420, 300)
    val (left, top, plotW, plotH) = (60, 40, 420 - 60 - 20, 300 - 40 - 60)
    def x(t: Long): Int = left + ((t - 105) * (plotW - 1) / 295L).toInt
    val yMax = 2 // max(1 map, 1 reduce + 1)
    def y(r: Int): Int = top + plotH - 1 - r * (plotH - 1) / yMax
    // map row (rank 0): red mid-bar, black start tick
    assert(img.getRGB(x(150), y(0)) === red, "map bar")
    assert(img.getRGB(x(110), y(0) - 2) === black, "map start tick")
    // reduce row (rank 1): green until shuffle-finish (from
    // max(start, maps-complete) = 200), yellow after
    assert(img.getRGB(x(250), y(1)) === green, "shuffle segment")
    assert(img.getRGB(x(350), y(1)) === yellow, "sort segment")
    assert(img.getRGB(x(300), y(1) - 2) === black, "shuffle-finish tick")
    // blue frame marks: baseline (visible beyond the map bar) +
    // maps-complete divider
    assert(img.getRGB(x(250), y(0)) === blue, "elapsed baseline")
    assert(img.getRGB(x(200), top + 30) === blue, "maps-done divider")
  }

  test("golden gantt: Pig-fixture plot-interior pixels are pinned") {
    val out = Files.createTempFile("graft-gantt-golden", ".png")
    try {
      Cli.run(spark, Cli.Config(input = Fixtures.pig,
        gantt = Some(out.toString), report = "m"))
      val img = ImageIO.read(out.toFile)
      assert(img.getWidth === 1200 && img.getHeight === 800)
      val hash = interiorHash(img)
      assert(hash === "2f8c9520fb8e7f0249fee9d07aecb447",
        s"rendered gantt interior pixel hash drifted: $hash")
    } finally Files.deleteIfExists(out)
  }

  test("CLI -png writes the reference-sized chart for the Pig fixture") {
    val out = Files.createTempFile("graft-chart", ".png")
    try {
      Cli.run(spark, Cli.Config(input = Fixtures.pig, png = Some(out.toString)))
      val img = ImageIO.read(out.toFile)
      assert(img != null, "valid PNG")
      assert(img.getWidth === 1200 && img.getHeight === 800)
      val pixels = for {
        x <- 60 until (1200 - 20)
        y <- 40 until (800 - 60)
      } yield img.getRGB(x, y)
      val present = pixels.toSet
      // the Pig job has long map and reduce phases and 127 failed map
      // attempts: real-work and waste series must both be visible
      assert(present.contains(blue), "maps series rendered")
      assert(present.contains(black), "waste series rendered")
    } finally Files.deleteIfExists(out)
  }
}
