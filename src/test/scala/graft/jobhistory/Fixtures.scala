package graft.jobhistory

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Reference fixture logs (SURVEY §5), materialized under target/ with
  * %-free names (Hadoop Path would URI-decode the original filenames).
  */
object Fixtures {
  private def materialize(src: String, dst: String): String = synchronized {
    val out = Paths.get("target", dst)
    Files.createDirectories(out.getParent)
    Files.copy(Paths.get(src), out, StandardCopyOption.REPLACE_EXISTING)
    out.toString
  }

  /** Pig kmerStats job: 512 maps / 320 reduces, 127 failed map attempts,
    * multi-line OOM stack traces (test/cvrsvc11-ib_…kmerStats.pig.txt). */
  lazy val pig: String = materialize(
    "/root/reference/test/cvrsvc11-ib_1288370608574_job_201010291643_0125_kbhatia_PigLatin%3AkmerStats.pig.txt",
    "pig_fixture.txt")

  /** EC2 job: 1024 maps / 144 reduces (clean-run fixture). */
  lazy val ec2: String = materialize(
    "/root/reference/test/ip-10-17-20-252.ec2.internal_1292531586602_job_201012162033_0001_hadoop_datasize%3D100000%2Ck%3D20%2Cr%3D1",
    "ec2_fixture.txt")

  val mapGolden = "/root/reference/vis/grap/map.d"
  val reduceGolden = "/root/reference/vis/grap/reduce.d"
}
