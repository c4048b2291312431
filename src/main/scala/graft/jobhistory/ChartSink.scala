package graft.jobhistory

import java.awt.image.BufferedImage
import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.io.OutputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** S6: the PNG chart sink — renders the timeline DataFrame as the
  * reference CGI's stacked chart (job_history.cgi:344-390: JFreeChart
  * stacked bar, 1200x800, five series). Rendered here with plain
  * `java.awt` so the engine carries no charting dependency.
  *
  * Series colors are the reference's exact legend paints
  * (job_history.cgi:359-363): Map #2222FF, Shuffle #22FF22,
  * Sort/"merge" #FF2222, Reduce #FFFF22, Waste #000000; chart
  * background #F9E7EC (job_history.cgi:372).
  *
  * This is presentation, not a distributed operator: the timeline DF is
  * collected to the driver (one row per scaled time unit — bounded by
  * the scale parameter, exactly as the reference's in-memory series
  * arrays are). When the spine is wider than the plot, adjacent time
  * units share a pixel column and the column shows their max — the same
  * visual downsampling a 1200px JFreeChart bar plot performs.
  */
object ChartSink {

  val Width = 1200
  val Height = 800

  private val seriesColors: Seq[(String, Color)] = Seq(
    "maps" -> new Color(0x22, 0x22, 0xFF),
    "shuffle" -> new Color(0x22, 0xFF, 0x22),
    "merge" -> new Color(0xFF, 0x22, 0x22),
    "reduce" -> new Color(0xFF, 0xFF, 0x22),
    "waste" -> new Color(0x00, 0x00, 0x00))

  private val background = new Color(249, 231, 236)
  private val plotBackground = Color.WHITE

  // legend labels as the reference names them (job_history.cgi:359-363)
  private val legendNames =
    Map("maps" -> "Map", "shuffle" -> "Shuffle", "merge" -> "Sort",
      "reduce" -> "Reduce", "waste" -> "Waste")

  /** Render a timeline DataFrame (`time, maps, shuffle, merge, reduce,
    * waste` — [[Reports.timeline]]'s shape) to a PNG file. */
  def writePng(timeline: DataFrame, path: String, title: String = "",
      width: Int = Width, height: Int = Height): Unit = {
    val out = Files.newOutputStream(Paths.get(path))
    try writePng(timeline, out, title, width, height) finally out.close()
  }

  /** Render to an arbitrary stream — the CGI surface (HTTP response
    * OutputStream, job_history.cgi:387). */
  def writePng(timeline: DataFrame, out: OutputStream, title: String,
      width: Int, height: Int): Unit = {
    val rows = timeline.collect()
    val series = seriesColors.map { case (name, _) =>
      rows.map(r => r.getAs[Long](name))
    }
    javax.imageio.ImageIO.write(render(series, title, width, height), "png", out)
  }

  /** Pure rendering core (testable without Spark): one array per series,
    * index = time unit. */
  private[jobhistory] def render(series: Seq[Array[Long]], title: String,
      width: Int, height: Int): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      // crisp 1px columns: no antialiasing, so the golden spec can
      // assert exact series colors
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_OFF)
      g.setColor(background)
      g.fillRect(0, 0, width, height)

      val (left, right, top, bottom) = (60, 20, 40, 60)
      val plotW = width - left - right
      val plotH = height - top - bottom
      g.setColor(plotBackground)
      g.fillRect(left, top, plotW, plotH)

      val n = series.headOption.map(_.length).getOrElse(0)
      val maxTotal = math.max(1L,
        (0 until n).map(t => series.map(_(t)).sum).foldLeft(0L)(math.max))

      if (n > 0) {
        // column-max downsampling when n > plotW; bar-widening when
        // n < plotW (stacked-bar look)
        var px = 0
        while (px < plotW) {
          val lo = (px.toLong * n / plotW).toInt
          val hi = math.max(lo, ((px + 1).toLong * n / plotW).toInt - 1)
          // the time unit with the tallest stack owns this pixel column
          val t = (lo to hi).maxBy(u => series.map(_(u)).sum)
          var yTop = top + plotH
          series.zip(seriesColors).foreach { case (s, (_, color)) =>
            val h = (s(t) * plotH.toLong / maxTotal).toInt
            if (h > 0) {
              g.setColor(color)
              g.fillRect(left + px, yTop - h, 1, h)
              yTop -= h
            }
          }
          px += 1
        }
      }

      // axes
      g.setColor(Color.DARK_GRAY)
      g.setStroke(new BasicStroke(1f))
      g.drawRect(left, top, plotW, plotH)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
      g.drawString("time", left + plotW / 2 - 12, height - 24)
      g.drawString("number of instances", 8, top - 8)
      g.drawString(s"0", left - 14, top + plotH + 4)
      g.drawString(maxTotal.toString, left - 14 - 7 * (maxTotal.toString.length - 1), top + 10)
      if (n > 0) g.drawString((n - 1).toString, left + plotW - 10, top + plotH + 16)
      if (title.nonEmpty) g.drawString(title, left, 20)

      drawLegend(g, left, height - 40)
      img
    } finally g.dispose()
  }

  /** Gantt parity for the reference's grap scripts
    * (vis/grap/reducegraph.gr:1-50, mapgraph.gr:1-11): one row per
    * task, maps as red start→end bars (rank 0 upward), reduces as a
    * green shuffle segment (max(start, maps-complete)→shuffle-finish)
    * then a yellow reduce segment (shuffle-finish→end), black start
    * ticks, a blue total-elapsed baseline and the blue maps-complete
    * divider — the same marks the grap/groff pipeline draws from
    * `map.d`/`reduce.d`, rendered directly from the `-m`/`-r` frames.
    *
    * Presentation sink like [[writePng]]: one collected row per task
    * (the reference plots the same per-task files). */
  def writeGantt(maps: DataFrame, reduces: DataFrame, path: String,
      title: String = "", width: Int = Width, height: Int = Height): Unit = {
    // a task whose START_TIME/FINISH_TIME attr never appeared in the
    // log yields null here (detailsBase casts attr lookups) — skip it,
    // like the null-guard filters in the tabular reports (P8), instead
    // of NPE-ing the whole plot; the optional mid-segment columns
    // default as before
    val m = maps.select("start_time", "end_time").collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rd = reduces
      .select("start_time", "maps_complete", "shuffle_finish", "end_time")
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(3))
      .map { r =>
        val end = r.getLong(3)
        (r.getLong(0),
          if (r.isNullAt(1)) r.getLong(0) else r.getLong(1),
          if (r.isNullAt(2)) end else r.getLong(2),
          end)
      }.toSeq
    val out = Files.newOutputStream(Paths.get(path))
    try javax.imageio.ImageIO.write(
      renderGantt(m, rd, title, width, height), "png", out)
    finally out.close()
  }

  /** Pure Gantt core (testable without Spark): maps as (start, end),
    * reduces as (start, maps_complete, shuffle_finish, end). */
  private[jobhistory] def renderGantt(maps: Seq[(Long, Long)],
      reduces: Seq[(Long, Long, Long, Long)], title: String,
      width: Int, height: Int): BufferedImage = {
    val cBlue = new Color(0x22, 0x22, 0xFF)
    val cGreen = new Color(0x22, 0xFF, 0x22)
    val cRed = new Color(0xFF, 0x22, 0x22)
    val cYellow = new Color(0xFF, 0xFF, 0x22)
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_OFF)
      g.setColor(background)
      g.fillRect(0, 0, width, height)
      val (left, right, top, bottom) = (60, 20, 40, 60)
      val plotW = width - left - right
      val plotH = height - top - bottom
      g.setColor(plotBackground)
      g.fillRect(left, top, plotW, plotH)
      if (maps.nonEmpty || reduces.nonEmpty) {
        val starts = maps.map(_._1) ++ reduces.map(_._1)
        val t0 = starts.min // reducegraph.gr: startTime = min start
        val endMapTime = (maps.map(_._2) :+ t0).max
        val endTime = (reduces.map(_._4) :+ endMapTime).max
        val span = math.max(1L, endTime - t0)
        def x(t: Long): Int =
          left + ((t - t0).toDouble * (plotW - 1) / span).toInt
        // maps rank from 0, reduces from 1 — the grap scripts' counters
        val yMax = math.max(1, math.max(maps.length, reduces.length + 1))
        def y(rank: Int): Int = top + plotH - 1 - rank * (plotH - 1) / yMax
        // blue frame marks first (total-elapsed baseline + maps-done
        // divider) so the per-task marks stay visible on rank 0
        g.setColor(cBlue)
        g.drawLine(x(t0), y(0), x(endTime), y(0))
        g.drawLine(x(endMapTime), y(yMax), x(endMapTime), y(0))
        maps.zipWithIndex.foreach { case ((s, e), r) =>
          val yy = y(r)
          g.setColor(Color.BLACK)
          g.drawLine(x(s), yy - 3, x(s), yy + 3) // vtick at start
          g.setColor(cRed)
          g.drawLine(x(s), yy, x(e), yy)
          g.fillRect(x(e) - 2, yy - 2, 5, 5) // square at end
        }
        reduces.zipWithIndex.foreach { case ((s, mc, sf, e), i) =>
          val yy = y(i + 1)
          val st = math.max(s, mc) // bullet at max(start, maps-complete)
          g.setColor(cGreen)
          g.fillOval(x(st) - 2, yy - 2, 5, 5)
          g.drawLine(x(st), yy, x(sf), yy) // shuffle segment
          g.setColor(Color.BLACK)
          g.drawLine(x(sf), yy - 3, x(sf), yy + 3) // vtick at shuffle end
          g.setColor(cYellow)
          g.drawLine(x(sf), yy, x(e), yy) // reduce segment
          g.fillRect(x(e) - 2, yy - 2, 5, 5)
        }
        g.setColor(Color.BLACK)
        g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
        // both labels live in the bottom MARGIN: glyph rasterization is
        // platform-dependent, so no text may land inside the plot rect
        // (the golden test hashes exactly that font-free interior)
        g.drawString((endTime - t0).toString,
          (x(t0) + x(endTime)) / 2, y(0) + 16)
        g.drawString(maps.length.toString, x(endTime) - 24, y(0) + 16)
      }
      g.setColor(Color.DARK_GRAY)
      g.setStroke(new BasicStroke(1f))
      g.drawRect(left, top, plotW, plotH)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
      g.drawString("time", left + plotW / 2 - 12, height - 24)
      g.drawString("task rank", 8, top - 8)
      if (title.nonEmpty) g.drawString(title, left, 20)
      img
    } finally g.dispose()
  }

  private def drawLegend(g: Graphics2D, x0: Int, y: Int): Unit = {
    var x = x0
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
    seriesColors.foreach { case (name, color) =>
      g.setColor(color)
      g.fillRect(x, y, 12, 12)
      g.setColor(Color.DARK_GRAY)
      g.drawRect(x, y, 12, 12)
      val label = legendNames(name)
      g.drawString(label, x + 16, y + 11)
      x += 16 + 8 * label.length + 24
    }
  }
}
