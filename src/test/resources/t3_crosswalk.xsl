<?xml version="1.0" encoding="UTF-8"?>
<!-- The t3 structural crosswalk as a real stylesheet file: the shape
     transform.py:20-76 would hand to Saxon. XmlSpec compiles this
     with Transform.compileXslt and asserts the rule tree and query
     output are identical to the hand-built t3 tree. -->
<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
  <xsl:template match="/record">
    <rec>
      <id><xsl:value-of select="controlfield[@tag='001']"/></id>
      <meta>
        <lang><xsl:value-of select="datafield[@tag='041']/subfield[@code='a']"/></lang>
        <url><xsl:value-of select="datafield[@tag='856']/subfield[@code='u']"/></url>
      </meta>
      <xsl:for-each select="controlfield">
        <cf>
          <tag><xsl:value-of select="@tag"/></tag>
          <val><xsl:value-of select="."/></val>
        </cf>
      </xsl:for-each>
      <xsl:for-each select="datafield">
        <df>
          <tag><xsl:value-of select="@tag"/></tag>
          <val><xsl:value-of select="subfield"/></val>
        </df>
      </xsl:for-each>
    </rec>
  </xsl:template>
</xsl:stylesheet>
